"""Every shipped config must build and initialize its model stack — catches
config/model mismatches across the full supported matrix (byte mode, MAS,
NSF, SE, FP, all sample rates)."""

import glob
import os

import pytest
import yaml

from kantts_tpu.models.builder import model_builder
from kantts_tpu.text.ling_unit import KanTtsLinguisticUnit

pytestmark = pytest.mark.slow

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "kantts_tpu", "configs")

MODEL_CONFIGS = sorted(
    os.path.basename(p)
    for p in glob.glob(os.path.join(CONFIG_DIR, "*.yaml"))
    if not os.path.basename(p).startswith("audio_config")
)


def _slim(params: dict) -> dict:
    """Shrink layer counts/widths so init stays fast; preserves every
    structural flag (MAS/NSF/SE/FP/byte, channel bookkeeping)."""
    slim = dict(params)
    for key, small in [
        ("encoder_num_layers", 1), ("decoder_num_layers", 1),
        ("predictor_fsmn_num_layers", 1), ("postnet_fsmn_num_layers", 1),
        ("embedding_dim", 32), ("encoder_ffn_inner_dim", 32),
        ("decoder_ffn_inner_dim", 32), ("predictor_ffn_inner_dim", 16),
        ("postnet_ffn_inner_dim", 16), ("encoder_num_units", 16),
        ("decoder_num_units", 16), ("predictor_num_memory_units", 16),
        ("postnet_num_memory_units", 16), ("predictor_lstm_units", 8),
        ("postnet_lstm_units", 8), ("dur_pred_lstm_units", 8),
        ("channels", 64),  # must stay >= 2^num_upsample_stages
    ]:
        if key in slim:
            slim[key] = small
    if "dur_pred_prenet_units" in slim:
        slim["dur_pred_prenet_units"] = [8, 8]
    if "decoder_prenet_units" in slim:
        slim["decoder_prenet_units"] = [8, 8]
    if "speaker_units" in slim and not slim.get("SE", False):
        slim["speaker_units"] = 8
    return slim


@pytest.mark.parametrize("config_name", MODEL_CONFIGS)
def test_config_builds(config_name):
    config = yaml.safe_load(open(os.path.join(CONFIG_DIR, config_name)))
    model_type = config["model_type"]

    if model_type == "sambert":
        lu = KanTtsLinguisticUnit(config)
        config["Model"]["KanTtsSAMBERT"]["params"].update(lu.get_unit_size())
        config["Model"]["KanTtsSAMBERT"]["params"] = _slim(
            config["Model"]["KanTtsSAMBERT"]["params"]
        )
    elif model_type == "sybert":
        lu = KanTtsLinguisticUnit(config)
        config["Model"]["KanTtsTextsyBERT"]["params"].update(lu.get_unit_size())
        config["Model"]["KanTtsTextsyBERT"]["params"] = _slim(
            config["Model"]["KanTtsTextsyBERT"]["params"]
        )
    else:
        config["Model"]["Generator"]["params"] = _slim(
            config["Model"]["Generator"]["params"]
        )
        for name in ("MultiScaleDiscriminator", "MultiPeriodDiscriminator"):
            if name in config["Model"]:
                dp = config["Model"][name]["params"].get("discriminator_params", {})
                dp["channels"] = 16
                dp["max_downsample_channels"] = 32
                if "max_groups" in dp:
                    dp["max_groups"] = 4

    built = model_builder(config)
    assert "state" in built
