import jax.numpy as jnp
import numpy as np

from kantts_tpu.utils.config import merge_configs
from kantts_tpu.utils.mask import get_mask_from_lengths, lengths_to_padded_lfr_lengths, mask_fill


def test_get_mask_from_lengths():
    lengths = jnp.array([3, 5, 0])
    mask = get_mask_from_lengths(lengths, max_len=5)
    expected = np.array(
        [
            [False, False, False, True, True],
            [False, False, False, False, False],
            [True, True, True, True, True],
        ]
    )
    np.testing.assert_array_equal(np.asarray(mask), expected)


def test_mask_fill_broadcasts_trailing_dims():
    x = jnp.ones((2, 3, 4))
    mask = jnp.array([[False, True, False], [True, False, False]])
    out = mask_fill(x, mask, 0.0)
    assert float(out[0, 1, 2]) == 0.0
    assert float(out[0, 0, 2]) == 1.0


def test_lfr_lengths():
    lengths = jnp.array([6, 7, 8, 9])
    np.testing.assert_array_equal(
        np.asarray(lengths_to_padded_lfr_lengths(lengths, 3)), [2, 3, 3, 3]
    )


def test_merge_configs_model_wins():
    audio = {"audio_config": {"sampling_rate": 16000}, "batch_size": 8}
    model = {"batch_size": 32, "model_type": "sambert"}
    merged = merge_configs(audio, model)
    assert merged["batch_size"] == 32
    assert merged["audio_config"]["sampling_rate"] == 16000
    assert merged["model_type"] == "sambert"
