"""Serving export (reni_tpu/serve.py): jax.export artifact round trips.

The deployment analog of the reference's notebook checkpoint-loading recipe
(examples.ipynb cell 4), as an ahead-of-time StableHLO artifact."""

import numpy as np
import jax
import jax.numpy as jnp

from reni_tpu import serve
from reni_tpu.core import sphere
from reni_tpu.models.reni import RENIConfig, RENIModel


def _broadcast_dirs(width, B):
    d = sphere.get_directions(width)
    return jnp.broadcast_to(d, (B,) + d.shape[1:])


def test_export_round_trip_symbolic_shapes(tmp_path):
    """One artifact serves any (batch, resolution): symbolic B and P."""
    model = RENIModel(
        RENIConfig(latent_dim=4, hidden_layers=1, hidden_features=16,
                   output_activation=None)
    )
    params = model.init(jax.random.PRNGKey(0), dataset_size=3)
    p = str(tmp_path / "dec.jaxexport")
    serve.save_exported(serve.export_decoder(model, params), p)
    f = serve.load_exported(p)
    for width, B in ((16, 3), (32, 2)):
        D = _broadcast_dirs(width, B)
        Z = model.latents(params, jnp.arange(B))
        np.testing.assert_allclose(
            np.asarray(f(Z, D)), np.asarray(model.apply(params, Z, D)), atol=1e-6
        )


def test_export_film_variant(tmp_path):
    model = RENIModel(
        RENIConfig(
            conditioning="FiLM", latent_dim=4, hidden_layers=2,
            hidden_features=16, mapping_layers=2, mapping_features=16,
            output_activation="tanh",
        )
    )
    params = model.init(jax.random.PRNGKey(1), dataset_size=2)
    p = str(tmp_path / "film.jaxexport")
    serve.save_exported(serve.export_decoder(model, params), p)
    f = serve.load_exported(p)
    D = _broadcast_dirs(16, 2)
    Z = model.latents(params, jnp.arange(2))
    np.testing.assert_allclose(
        np.asarray(f(Z, D)), np.asarray(model.apply(params, Z, D)), atol=1e-6
    )


def test_export_pallas_config_uses_xla_path(tmp_path):
    """A use_pallas model config must still export (XLA path baked in)."""
    model = RENIModel(
        RENIConfig(latent_dim=4, hidden_layers=1, hidden_features=16,
                   output_activation=None, use_pallas=True, fast_sine=True)
    )
    params = model.init(jax.random.PRNGKey(2), dataset_size=2)
    p = str(tmp_path / "pl.jaxexport")
    serve.save_exported(serve.export_decoder(model, params), p)
    f = serve.load_exported(p)
    D = _broadcast_dirs(16, 2)
    Z = model.latents(params, jnp.arange(2))
    xla_model = RENIModel(
        RENIConfig(latent_dim=4, hidden_layers=1, hidden_features=16,
                   output_activation=None, use_pallas=False, fast_sine=True)
    )
    np.testing.assert_allclose(
        np.asarray(f(Z, D)), np.asarray(xla_model.apply(params, Z, D)), atol=1e-6
    )


def test_export_cli_from_checkpoint(tmp_path):
    from reni_tpu.cli.export import main as export_main
    from reni_tpu.train import checkpoint as ckpt

    cfg = RENIConfig(latent_dim=4, hidden_layers=1, hidden_features=16,
                     output_activation=None)
    model = RENIModel(cfg)
    params = model.init(jax.random.PRNGKey(3), dataset_size=4)
    ck = str(tmp_path / "ck")
    ckpt.save_checkpoint(ck, params, model_config=cfg, metadata={"epoch": 1})
    out = str(tmp_path / "dec.jaxexport")
    assert export_main(["--checkpoint", ck, "--out", out]) == 0
    f = serve.load_exported(out)
    D = _broadcast_dirs(16, 4)
    Z = model.latents(params, jnp.arange(4))
    np.testing.assert_allclose(
        np.asarray(f(Z, D)), np.asarray(model.apply(params, Z, D)), atol=1e-6
    )


def test_http_serving_daemon(tmp_path):
    """cli/serve.py: health, /decode on raw latents, /decode_idx from a
    checkpoint's fitted table, base64 payloads, and JSON errors."""
    import base64
    import json
    import threading
    import urllib.request

    from reni_tpu.cli.serve import make_server
    from reni_tpu.train import checkpoint as ckpt

    cfg = RENIConfig(latent_dim=4, hidden_layers=1, hidden_features=16,
                     output_activation=None)
    model = RENIModel(cfg)
    params = model.init(jax.random.PRNGKey(5), dataset_size=3)
    ck = str(tmp_path / "ck")
    ckpt.save_checkpoint(ck, params, model_config=cfg, metadata={"epoch": 1})
    art = str(tmp_path / "dec.jaxexport")
    serve.save_exported(serve.export_decoder(model, params), art)

    httpd = make_server(art, ck, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        def post(path, payload):
            req = urllib.request.Request(
                base + path, json.dumps(payload).encode(),
                {"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        with urllib.request.urlopen(base + "/healthz") as r:
            health = json.loads(r.read())
        assert health["ok"] and health["has_latents"] and health["dataset_size"] == 3

        width = 16
        Z = np.asarray(model.latents(params, jnp.arange(2)))
        code, body = post("/decode", {"z": Z.tolist(), "width": width,
                                      "format": "base64"})
        assert code == 200 and body["shape"] == [2, 8, 16, 3]
        out = np.frombuffer(base64.b64decode(body["data"]), np.float32).reshape(
            body["shape"]
        )
        D = _broadcast_dirs(width, 2)
        ref = np.asarray(model.apply(params, jnp.asarray(Z), D)).reshape(out.shape)
        np.testing.assert_allclose(out, ref, atol=1e-6)

        code, body = post("/decode_idx", {"idx": [0, 2], "width": width})
        assert code == 200 and body["shape"] == [2, 8, 16, 3]
        ref_idx = np.asarray(
            model.apply(params, model.latents(params, jnp.asarray([0, 2])), D)
        ).reshape(body["shape"])
        np.testing.assert_allclose(np.asarray(body["data"]), ref_idx, atol=1e-5)

        code, body = post("/decode", {"width": width})  # missing z
        assert code == 400 and "error" in body
    finally:
        httpd.shutdown()


def test_http_rotation_equivariance(tmp_path):
    """The daemon's rotation_y parameter: rotating the illumination through
    the HTTP surface must equal a pixel-space column roll of the unrotated
    decode (the SO2 decoder's equivariance, end to end)."""
    import json
    import threading
    import urllib.request

    from reni_tpu.cli.serve import make_server
    from reni_tpu.train import checkpoint as ckpt

    cfg = RENIConfig(latent_dim=4, hidden_layers=1, hidden_features=32,
                     equivariance="SO2", output_activation=None)
    model = RENIModel(cfg)
    params = model.init(jax.random.PRNGKey(7), dataset_size=2)
    ck = str(tmp_path / "ck")
    ckpt.save_checkpoint(ck, params, model_config=cfg, metadata={"epoch": 1})
    art = str(tmp_path / "dec.jaxexport")
    serve.save_exported(serve.export_decoder(model, params), art)

    httpd = make_server(art, ck, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        def post(path, payload):
            req = urllib.request.Request(
                base + path, json.dumps(payload).encode(),
                {"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        width, cols = 32, 4  # 4 columns = 45 degrees at W=32
        plain = np.asarray(
            post("/decode_idx", {"idx": [0, 1], "width": width})["data"]
        )
        rot = np.asarray(
            post("/decode_idx", {"idx": [0, 1], "width": width,
                                 "rotation_y": 360.0 * cols / width})["data"]
        )
        np.testing.assert_allclose(
            rot, np.roll(plain, cols, axis=2), atol=2e-5
        )
        # /decode takes it too
        Z = np.asarray(model.latents(params, jnp.arange(1)))
        r1 = np.asarray(post("/decode", {"z": Z.tolist(), "width": width,
                                         "rotation_y": 90.0})["data"])
        r0 = np.asarray(post("/decode", {"z": Z.tolist(), "width": width})["data"])
        np.testing.assert_allclose(r1, np.roll(r0, width // 4, axis=2), atol=2e-5)
    finally:
        httpd.shutdown()


def test_http_micro_batching(tmp_path):
    """--batch_window_ms: concurrent same-width decodes coalesce into
    fewer dispatches (healthz stats prove it) with per-request results
    identical to unbatched decodes — including differently-rotated
    requests (rotation applied pre-coalesce)."""
    import json
    import threading
    import urllib.request

    from reni_tpu.cli.serve import make_server
    from reni_tpu.train import checkpoint as ckpt

    cfg = RENIConfig(latent_dim=4, hidden_layers=1, hidden_features=32,
                     equivariance="SO2", output_activation=None)
    model = RENIModel(cfg)
    params = model.init(jax.random.PRNGKey(11), dataset_size=4)
    ck = str(tmp_path / "ck")
    ckpt.save_checkpoint(ck, params, model_config=cfg, metadata={"epoch": 1})
    art = str(tmp_path / "dec.jaxexport")
    serve.save_exported(serve.export_decoder(model, params), art)

    httpd = make_server(art, ck, port=0, batch_window_ms=700.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        def post(path, payload):
            req = urllib.request.Request(
                base + path, json.dumps(payload).encode(),
                {"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        width = 16
        results = {}

        def one(i, rot):
            results[i] = np.asarray(
                post("/decode_idx",
                     {"idx": [i], "width": width, "rotation_y": rot})["data"]
            )

        rots = {0: 0.0, 1: 90.0, 2: 0.0, 3: 180.0}
        threads = [
            threading.Thread(target=one, args=(i, rots[i])) for i in range(4)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert set(results) == {0, 1, 2, 3}

        # warmup decodes through the artifact signature (no HTTP, no error)
        httpd.reni_service.warmup([16], batch=2)

        with urllib.request.urlopen(base + "/healthz") as r:
            health = json.loads(r.read())
        stats = health["batching"]
        assert stats["requests"] == 4
        # 4 requests fired together under a 700 ms window must coalesce
        # (exact grouping can vary under scheduler noise, but strictly
        # fewer dispatches than requests is the contract)
        assert stats["dispatches"] < 4, stats

        # per-request correctness vs direct (unbatched) decodes
        D = _broadcast_dirs(width, 1)
        from reni_tpu.core import sphere as _sph

        for i in range(4):
            z = np.asarray(model.latents(params, jnp.asarray([i])))
            if rots[i]:
                z = z @ np.asarray(
                    _sph.rotation_y(-np.deg2rad(rots[i])), np.float32
                )
            ref = np.asarray(model.apply(params, jnp.asarray(z), D)).reshape(
                1, width // 2, width, 3
            )
            np.testing.assert_allclose(results[i], ref, atol=1e-5, err_msg=str(i))
    finally:
        httpd.shutdown()


def test_http_rotation_guards(tmp_path):
    """NaN rotation_y must 400 (json accepts NaN), and a decoder trained
    with EQUIVARIANCE None must reject rotation outright."""
    import json
    import threading
    import urllib.request

    from reni_tpu.cli.serve import make_server
    from reni_tpu.train import checkpoint as ckpt

    cfg = RENIConfig(latent_dim=4, hidden_layers=1, hidden_features=16,
                     equivariance="None", output_activation=None)
    model = RENIModel(cfg)
    params = model.init(jax.random.PRNGKey(9), dataset_size=2)
    ck = str(tmp_path / "ck")
    ckpt.save_checkpoint(ck, params, model_config=cfg, metadata={"epoch": 1})
    art = str(tmp_path / "dec.jaxexport")
    serve.save_exported(serve.export_decoder(model, params), art)

    httpd = make_server(art, ck, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        def post(payload_text):
            req = urllib.request.Request(
                base + "/decode_idx", payload_text.encode(),
                {"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, body = post('{"idx": [0], "width": 16, "rotation_y": NaN}')
        assert code == 400 and "finite" in body["error"]
        code, body = post('{"idx": [0], "width": 16, "rotation_y": 45.0}')
        assert code == 400 and "EQUIVARIANCE None" in body["error"]
        code, body = post('{"idx": [0], "width": 16}')  # no rotation: fine
        assert code == 200
    finally:
        httpd.shutdown()
