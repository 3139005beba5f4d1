"""Config tree: defaults, YAML overlay (the reference's experiment.yaml
format), key-indexed access, experiment naming."""

import textwrap

from reni_tpu.models.reni import RENIConfig
from reni_tpu.utils.config import Config, experiment_name, get_cfg_defaults


def test_defaults_have_reference_keys():
    cfg = get_cfg_defaults()
    assert cfg.RENI.LATENT_DIMENSION == 36
    assert cfg.RENI.FIT_DECODER.LR_START == 1e-5
    assert cfg.RENI.FIT_LATENT.MASK_PATH.endswith("Mask-3.png")
    assert cfg.DATASET.RENI_HDR.IS_HDR is True
    assert cfg.TRAINER.CHKPTS.EVERY_N_EPOCHS == 10
    # yacs-style dynamic access used by the reference trainer
    assert cfg.RENI["FIT_DECODER"].EPOCHS == 2400
    assert cfg.DATASET[cfg.DATASET.NAME].PATH == "data/RENI_HDR"


def test_merge_from_yaml(tmp_path):
    yaml_text = textwrap.dedent(
        """
        RENI:
          TASKS: ["FIT_LATENT"]
          MODEL_TYPE: VariationalAutoDecoder
          CONDITIONING: Cond-by-Concat
          LATENT_DIMENSION: 49
          OUTPUT_ACTIVATION: tanh
          FIT_DECODER:
            BATCH_SIZE: 100
            CURRICULUM: [800, 1600]
        DATASET:
          NAME: RENI_LDR
        """
    )
    p = tmp_path / "exp.yaml"
    p.write_text(yaml_text)
    cfg = get_cfg_defaults().merge_from_file(str(p))
    assert cfg.RENI.LATENT_DIMENSION == 49
    assert cfg.RENI.FIT_DECODER.BATCH_SIZE == 100
    assert cfg.RENI.FIT_DECODER.CURRICULUM == [800, 1600]
    # untouched defaults survive the merge
    assert cfg.RENI.FIT_DECODER.LR_START == 1e-5
    assert cfg.RENI.HIDDEN_LAYERS == 5
    assert cfg.DATASET.NAME == "RENI_LDR"


def test_model_config_from_reni_cfg():
    cfg = get_cfg_defaults()
    cfg.RENI.LATENT_DIMENSION = 49
    mc = RENIConfig.from_reni_cfg(cfg.RENI, task="FIT_LATENT")
    assert mc.latent_dim == 49
    assert mc.fixed_decoder is True
    mc2 = RENIConfig.from_reni_cfg(cfg.RENI, task="FIT_DECODER")
    assert mc2.fixed_decoder is False


def test_experiment_name_matches_reference_format():
    cfg = get_cfg_defaults()
    cfg.RENI.MODEL_TYPE = "VariationalAutoDecoder"
    cfg.RENI.CONDITIONING = "Cond-by-Concat"
    cfg.RENI.LATENT_DIMENSION = 49
    cfg.RENI.OUTPUT_ACTIVATION = "tanh"
    assert experiment_name(cfg) == "latent_dim_49_net_5_256_vad_cbc_tanh_hdr"


def test_clone_is_deep():
    cfg = get_cfg_defaults()
    c2 = cfg.clone()
    c2.RENI.LATENT_DIMENSION = 999
    assert cfg.RENI.LATENT_DIMENSION == 36


def test_merge_rejects_unknown_keys():
    """yacs semantics (reference run.py:136-137): a typo'd or misplaced key
    raises instead of being silently dropped — e.g. per-task blocks at the
    top level instead of under RENI."""
    import pytest

    from reni_tpu.utils.config import get_cfg_defaults

    with pytest.raises(KeyError, match="FIT_DECODER"):
        get_cfg_defaults().merge_from_dict({"FIT_DECODER": {"EPOCHS": 5}})
    with pytest.raises(KeyError, match="RENI.LATENT_DIMENSIONS"):
        get_cfg_defaults().merge_from_dict({"RENI": {"LATENT_DIMENSIONS": 49}})
