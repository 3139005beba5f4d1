"""Config tree with the reference's exact key names, YAML-overlayable.

A lightweight replacement for yacs (reference: configs/default.py): a nested
attribute-dict created from defaults, deep-merged from a YAML file. The key
names and defaults reproduce configs/default.py:1-139 verbatim so published
experiment YAMLs (e.g. the reference's configs/experiment.yaml) load
unchanged; keys the TPU build does not use (e.g. WANDB) are accepted and
ignored by the trainer.
"""

from __future__ import annotations

import copy
from typing import Any


class Config(dict):
    """dict with attribute access and yacs-style merge, e.g. cfg.RENI.TASKS
    and cfg.RENI[task].BATCH_SIZE both work."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def _wrap(value):
        if isinstance(value, dict) and not isinstance(value, Config):
            return Config({k: Config._wrap(v) for k, v in value.items()})
        return value

    def merge_from_dict(self, other: dict, _prefix: str = "") -> "Config":
        """Deep-merge ``other`` into this tree. Keys absent from the
        defaults raise (yacs ``merge_from_file`` semantics — a silently
        ignored typo'd or misplaced key is a config bug: e.g. the per-task
        blocks live under RENI, not at the top level)."""
        for k, v in other.items():
            dotted = f"{_prefix}{k}"
            if k not in self:
                raise KeyError(
                    f"non-existent config key: {dotted!r} (reference schema "
                    "configs/default.py; per-task blocks live under RENI)"
                )
            if isinstance(v, dict) and isinstance(self.get(k), Config):
                self[k].merge_from_dict(v, _prefix=dotted + ".")
            else:
                self[k] = Config._wrap(v)
        return self

    def merge_from_file(self, path: str) -> "Config":
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f) or {}
        return self.merge_from_dict(data)

    def clone(self) -> "Config":
        return Config._wrap(copy.deepcopy(dict(self)))

    def to_dict(self) -> dict:
        return {
            k: (v.to_dict() if isinstance(v, Config) else v) for k, v in self.items()
        }


_TASK_COMMON = dict(
    LR_START=1e-2,
    LR_END=1e-5,
    OPTIMIZER="adam",
    OPTIMIZER_BETA_1=0.0,
    OPTIMIZER_BETA_2=0.999,
    SCHEDULER_TYPE="exponential",
    SCHEDULER_STEP_SIZE=1,
    SCHEDULER_GAMMA=1,
    BATCH_SIZE=1,
    EPOCHS=1200,
    MULTI_RES_TRAINING=True,
    INITAL_RESOLUTION=[16, 32],  # sic — the reference's spelling
    FINAL_RESOLUTION=[64, 128],
    CURRICULUM=[25, 80, 150],
)

_DEFAULTS = {
    "RENI": {
        "TASKS": ["FIT_DECODER", "FIT_LATENT"],
        "MODEL_TYPE": "VariationalAutoDecoder",
        "CONDITIONING": "FiLM",
        "EQUIVARIANCE": "SO2",
        "LATENT_DIMENSION": 36,
        "HIDDEN_LAYERS": 5,
        "HIDDEN_FEATURES": 256,
        "OUT_FEATURES": 3,
        "LAST_LAYER_LINEAR": True,
        "OUTPUT_ACTIVATION": None,
        "FIRST_OMEGA_0": 30.0,
        "HIDDEN_OMEGA_0": 30.0,
        "MAPPING_LAYERS": 3,
        "MAPPING_FEATURES": 256,
        # TPU-build extension: first-layer init bound multiplier (1.0 = the
        # reference's U(+-1/in)); ~sqrt(in(N)/in(49)) compensates the
        # shrinking pre-activation std at large latent dims (A/B on the
        # N=100 chain: PERF.md "FIRST_LAYER_INIT_SCALE A/B")
        "FIRST_LAYER_INIT_SCALE": 1.0,
        "FIT_DECODER": {
            **_TASK_COMMON,
            "LR_START": 1e-5,
            "LR_END": 1e-7,
            "EPOCHS": 2400,
            "KLD_WEIGHTING": 1e-4,
        },
        "FIT_LATENT": {
            **_TASK_COMMON,
            "COSINE_SIMILARITY_WEIGHT": 1e-4,
            "PRIOR_LOSS_WEIGHT": 1e-7,
            "APPLY_MASK": False,
            "MASK_PATH": "data/Masks/Mask-3.png",
        },
        "FIT_INVERSE": {
            **_TASK_COMMON,
            "MULTI_RES_TRAINING": False,
            "COSINE_SIMILARITY_WEIGHT": 1e-4,
            "PRIOR_LOSS_WEIGHT": 1e-7,
            "RENDERER": "JAX",
            "RENDER_RESOLUTION": 64,
            "OBJECT_PATH": "data/3D_Models/teapot.obj",
            "KD_VALUE": 1.0,
            # TPU-build extension: static camera views (paired degree
            # lists). The DEFAULT is the reference's single look_at(dist,
            # 0, 0) camera (pytorch3d_envmap_shader.py:195-217), so
            # published configs (which have no AZIMUTHS key) run the same
            # inverse experiment the reference would. Multi-view is the
            # documented opt-in — e.g. [0, 120, 240]/[0, 30, -30] lifts
            # the teapot's worst-view render correlation 0.55 -> 0.995 and
            # test PSNR 36.6 -> 38.5 dB with the same decoder (PERF.md
            # r5 single-view control A/B)
            "AZIMUTHS": [0.0],
            "ELEVATIONS": [0.0],
        },
    },
    "DATASET": {
        "NAME": "RENI_HDR",
        "RENI_HDR": {
            "PATH": "data/RENI_HDR",
            "TRANSFORMS": [["minmaxnormalise", [-18.0536, 11.4633]]],
            "IS_HDR": True,
            # opt-in: re-draw random transforms every epoch (the reference's
            # per-__getitem__ semantics); off = draw once at staging
            "REAUGMENT_PER_EPOCH": False,
        },
        "RENI_LDR": {
            "PATH": "data/RENI_LDR",
            "TRANSFORMS": [],
            "IS_HDR": False,
            "REAUGMENT_PER_EPOCH": False,
        },
        "CUSTOM": {
            "PATH": "data/custom",
            "TRANSFORMS": [],
            "IS_HDR": False,
            "REAUGMENT_PER_EPOCH": False,
        },
    },
    "TRAINER": {
        "LOGGER_TYPE": "tensorboard",
        "SEED": 42,
        "MIXED_PRECISION": False,
        "MAX_RUNTIME": 24,
        "CHKPTS": {
            "SAVE": True,
            "SAVE_DIR": "checkpoints",
            "EVERY_N_EPOCHS": 10,
            "LOAD_PATH": None,
        },
        "LOGGER": {
            "LOG_IMAGES": True,
            "NUMBER_OF_IMAGES": 10,
            "IMAGES_TO_SHOW": "noise",
            "EPOCHS_BETWEEN_EXAMPLES": 1,
            "WANDB": {
                "NAME": "RENI",
                "PROJECT": "RENI",
                "SAVE_DIR": "wandb",
                "OFFLINE": False,
                "LOG_MODEL": True,
            },
            "TB": {"SAVE_DIR": "models", "NAME": "auto", "LOG_GRAPH": True},
        },
    },
    # TPU-specific extensions (absent from the reference; defaults preserve
    # single-chip behaviour)
    "TPU": {
        # default mesh when --mesh is absent; 1x1x1 = single-program path,
        # DATA: -1 = all remaining devices on the data axis; MODEL > 1
        # tensor-parallelises the decoder trunk (hidden features sharded,
        # Megatron column/row layout — parallel/mesh.py)
        "MESH": {"DATA": 1, "PIXEL": 1, "MODEL": 1},
        # row-shard the per-image latent tables (and their adam moments)
        # over the data axis — embedding-style sharding for huge datasets
        # (parallel/mesh.py); requires a multi-device mesh
        "SHARD_LATENTS": False,
        "USE_PALLAS": True,  # fused Pallas decoder trunk — the fastest path
        # (auto-falls back to XLA for shapes the kernel does not support,
        # e.g. hidden widths not lane-aligned)
        # matmul precision: bfloat16 = the TPU's native bf16-input matmul
        # (the platform default); float32/tensorfloat32 force full/TF32
        # precision via jax_default_matmul_precision
        "PRECISION": "bfloat16",
        # polynomial sine (core/fastmath.py, ~3.6e-6 abs error): the sine, not
        # the matmul, dominates the SIREN hot path on TPU — 2-4x faster trunk.
        # Set false for bitwise sine parity with the reference.
        "FAST_SINE": True,
        # keep the dataset in HOST RAM and transfer one (double-buffered)
        # batch per optimizer step instead of staging the whole set in HBM —
        # for datasets larger than device memory (train/tasks.py
        # streaming_stage_runner). Identical semantics; trades the
        # whole-stage scan for per-step dispatch. Multi-host: each process
        # transfers only its addressable shard of every batch.
        "STREAM_DATA": False,
        # with STREAM_DATA: optimizer steps per dispatch — each transfer
        # stages a K-batch super-slice and one compiled scan runs K steps
        # against it, amortising per-dispatch latency (tunneled/remote
        # chips pay an RTT per dispatch) at the cost of K batches of HBM
        # instead of 1. Rounded down to the largest divisor of the
        # per-epoch batch count (keeps chunks epoch-aligned).
        "STREAM_CHUNK": 1,
        # transfer dtype for the streaming tiers (float32 | bfloat16).
        # Streaming through a tunneled chip is TRANSFER-bound (~40 ms of
        # dispatch-pipeline stall per transferred MB regardless of
        # overlap — PERF.md r5 stall profile), so bfloat16 targets double
        # the streaming throughput ceiling at the cost of quantizing the
        # regression targets (loss math stays f32 after promotion).
        "STREAM_DTYPE": "float32",
        # compile LATER curriculum stages' whole-stage programs in
        # background threads while the current stage trains
        # (train/precompile.py) — published chains on tunneled chips are
        # compile-dominated (PERF.md). Resident single-program path only
        # (ignored with a mesh / STREAM_DATA / REAUGMENT_PER_EPOCH); any
        # background-compile failure falls back to the inline compile.
        "PRECOMPILE": False,
        # out-of-core data path: decode batches from DISK on demand (lazy
        # dataset + background-prefetched row decodes through the native
        # EXR reader) instead of holding the decoded dataset in host RAM —
        # for datasets larger than host memory. Implies STREAM_DATA for
        # the training residency. Requires deterministic transforms (the
        # random-transform RNG is sequential over the staged set).
        "STREAM_FROM_DISK": False,
    },
}


def get_cfg_defaults() -> Config:
    """Default config tree (mirrors configs/default.py:136-139)."""
    return Config._wrap(copy.deepcopy(_DEFAULTS))


def experiment_name(config: Config) -> str:
    """Auto experiment naming matching run.py:43-49."""
    c = config.RENI
    return (
        f"latent_dim_{c.LATENT_DIMENSION}_net_"
        f"{c.HIDDEN_LAYERS}_{c.HIDDEN_FEATURES}_"
        f"{'vad' if c.MODEL_TYPE == 'VariationalAutoDecoder' else 'ad'}_"
        f"{'cbc' if c.CONDITIONING == 'Cond-by-Concat' else 'film'}_"
        f"{c.OUTPUT_ACTIVATION}_"
        f"{'hdr' if config.DATASET[config.DATASET.NAME].IS_HDR else 'ldr'}"
    )
