"""Loss library (jittable, functional core with thin class wrappers).

Parity target: /root/reference/kantts/train/loss.py:7-544. Each class mirrors
the reference criterion of the same name; ``criterion_builder`` keeps the
config contract (per-loss ``enable``/``params``/``weights``).

All reductions divide by VALID element counts from the padding masks, exactly
matching the reference's masked means (loss.py:18-37,61-85) — bucketed padding
therefore cannot change loss values.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import optax

from kantts_tpu.dsp.mel import LossMelSpectrogram
from kantts_tpu.dsp.stft import hann_window, stft_magnitude
from kantts_tpu.utils.mask import get_mask_from_lengths


def _elementwise(loss_type: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    if loss_type == "mae":
        return jnp.abs(a - b)
    if loss_type == "mse":
        return (a - b) ** 2
    raise ValueError(f"Unknown loss type: {loss_type}")


class MelReconLoss:
    """Masked L1/L2 on decoder + postnet mels (reference loss.py:7-37)."""

    def __init__(self, loss_type: str = "mae"):
        self.loss_type = loss_type
        self.weights = 1.0

    def __call__(self, output_lengths, mel_targets, dec_outputs, postnet_outputs=None):
        valid = ~get_mask_from_lengths(output_lengths, mel_targets.shape[1])
        denom = valid.sum() * mel_targets.shape[-1]
        mel_loss_ = jnp.sum(
            _elementwise(self.loss_type, mel_targets, dec_outputs)
            * valid[..., None]
        ) / denom
        if postnet_outputs is not None:
            mel_loss = jnp.sum(
                _elementwise(self.loss_type, mel_targets, postnet_outputs)
                * valid[..., None]
            ) / denom
        else:
            mel_loss = 0.0
        return mel_loss_, mel_loss


class ProsodyReconLoss:
    """Masked log-duration/pitch/energy losses (reference loss.py:40-85)."""

    def __init__(self, loss_type: str = "mae"):
        self.loss_type = loss_type
        self.weights = 1.0

    def __call__(
        self,
        input_lengths,
        duration_targets,
        pitch_targets,
        energy_targets,
        log_duration_predictions,
        pitch_predictions,
        energy_predictions,
    ):
        valid = ~get_mask_from_lengths(input_lengths, duration_targets.shape[1])
        denom = valid.sum()
        dur_loss = jnp.sum(
            _elementwise(
                self.loss_type,
                jnp.log(duration_targets.astype(jnp.float32) + 1.0),
                log_duration_predictions,
            ) * valid
        ) / denom
        pitch_loss = jnp.sum(
            _elementwise(self.loss_type, pitch_targets, pitch_predictions) * valid
        ) / denom
        energy_loss = jnp.sum(
            _elementwise(self.loss_type, energy_targets, energy_predictions) * valid
        ) / denom
        return dur_loss, pitch_loss, energy_loss


class FpCELoss:
    """Class-weighted CE over the 4 FP classes (reference loss.py:88-105)."""

    def __init__(self, loss_type: str = "ce", weight: Sequence[float] = (1, 4, 4, 8)):
        self.weight = jnp.asarray(weight, dtype=jnp.float32)
        self.weights = 1.0

    def __call__(self, input_lengths, fp_pd, fp_label):
        """fp_pd: (B, T, 4) probabilities. The reference model emits softmax
        output (kantts_sambert.py:708) and feeds it straight into
        CrossEntropyLoss (loss.py:100), which applies ANOTHER log_softmax to
        the probabilities as if they were logits — so the effective loss is
        -w*log_softmax(p), NOT -w*log(p). Reproduced exactly (verified by
        the FP trajectory-parity harness, tools/cross_stack_parity.py --fp;
        taking log(p) first would un-do the double softmax and overstate
        the loss by ~30% at init)."""
        valid = ~get_mask_from_lengths(input_lengths, fp_label.shape[1])
        logp = jax.nn.log_softmax(fp_pd, axis=-1)
        onehot = jax.nn.one_hot(fp_label, 4)
        w = self.weight[fp_label]
        ce = -(onehot * logp).sum(-1) * w
        return jnp.sum(ce * valid) / valid.sum()


class GeneratorAdversarialLoss:
    """(reference loss.py:108-151)."""

    def __init__(self, average_by_discriminators: bool = True, loss_type: str = "mse"):
        assert loss_type in ("mse", "hinge")
        self.average_by_discriminators = average_by_discriminators
        self.loss_type = loss_type
        self.weights = 1.0

    def _one(self, x):
        if self.loss_type == "mse":
            return jnp.mean((x - 1.0) ** 2)
        return -jnp.mean(x)

    def __call__(self, outputs):
        if isinstance(outputs, (tuple, list)):
            adv = sum(self._one(o) for o in outputs)
            if self.average_by_discriminators:
                adv = adv / len(outputs)
            return adv
        return self._one(outputs)


class DiscriminatorAdversarialLoss:
    """(reference loss.py:154-216)."""

    def __init__(self, average_by_discriminators: bool = True, loss_type: str = "mse"):
        assert loss_type in ("mse", "hinge")
        self.average_by_discriminators = average_by_discriminators
        self.loss_type = loss_type
        self.weights = 1.0

    def _real(self, x):
        if self.loss_type == "mse":
            return jnp.mean((x - 1.0) ** 2)
        return -jnp.mean(jnp.minimum(x - 1.0, 0.0))

    def _fake(self, x):
        if self.loss_type == "mse":
            return jnp.mean(x ** 2)
        return -jnp.mean(jnp.minimum(-x - 1.0, 0.0))

    def __call__(self, outputs_hat, outputs):
        if isinstance(outputs, (tuple, list)):
            real = fake = 0.0
            for o_hat, o in zip(outputs_hat, outputs):
                if isinstance(o_hat, (tuple, list)):
                    o_hat, o = o_hat[-1], o[-1]
                real += self._real(o)
                fake += self._fake(o_hat)
            if self.average_by_discriminators:
                real /= len(outputs)
                fake /= len(outputs)
            return real, fake
        return self._real(outputs), self._fake(outputs_hat)


class FeatureMatchLoss:
    """L1 between fake and (stop-gradient) real feature maps
    (reference loss.py:219-256)."""

    def __init__(self, average_by_layers: bool = True,
                 average_by_discriminators: bool = True):
        self.average_by_layers = average_by_layers
        self.average_by_discriminators = average_by_discriminators
        self.weights = 1.0

    def __call__(self, feats_hat: List[List[jnp.ndarray]],
                 feats: List[List[jnp.ndarray]]):
        total = 0.0
        for fmap_hat, fmap in zip(feats_hat, feats):
            fm = 0.0
            for f_hat, f in zip(fmap_hat, fmap):
                fm += jnp.mean(jnp.abs(f_hat - jax.lax.stop_gradient(f)))
            if self.average_by_layers:
                fm /= len(fmap)
            total += fm
        if self.average_by_discriminators:
            total /= len(feats)
        return total


class MelSpectrogramLoss:
    """L1 on loss-flavor mel spectrograms (reference loss.py:259-311)."""

    def __init__(self, fs=22050, fft_size=1024, hop_size=256, win_length=None,
                 window="hann", num_mels=80, fmin=80, fmax=7600, center=True,
                 normalized=False, onesided=True, eps=1e-10, log_base=10.0):
        del normalized, onesided
        self.mel = LossMelSpectrogram(
            fs=fs, fft_size=fft_size, hop_size=hop_size, win_length=win_length,
            window=window, num_mels=num_mels, fmin=fmin, fmax=fmax,
            center=center, eps=eps, log_base=log_base,
        )
        self.weights = 1.0

    def __call__(self, y_hat, y):
        return jnp.mean(jnp.abs(self.mel(y_hat) - self.mel(y)))


class STFTLoss:
    """Spectral-convergence + log-magnitude at one resolution
    (reference loss.py:314-389)."""

    def __init__(self, fft_size=1024, shift_size=120, win_length=600,
                 window="hann_window"):
        assert window == "hann_window"
        self.fft_size = fft_size
        self.shift_size = shift_size
        self.win_length = win_length
        self.window = jnp.asarray(hann_window(win_length))

    def __call__(self, x, y):
        x_mag = stft_magnitude(x, self.fft_size, self.shift_size,
                               self.win_length, self.window)
        y_mag = stft_magnitude(y, self.fft_size, self.shift_size,
                               self.win_length, self.window)
        sc = jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)
        mag = jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))
        return sc, mag


class MultiResolutionSTFTLoss:
    """(reference loss.py:392-441)."""

    def __init__(self, fft_sizes=(1024, 2048, 512), hop_sizes=(120, 240, 50),
                 win_lengths=(600, 1200, 240), window="hann_window"):
        assert len(fft_sizes) == len(hop_sizes) == len(win_lengths)
        self.stft_losses = [
            STFTLoss(f, s, w, window)
            for f, s, w in zip(fft_sizes, hop_sizes, win_lengths)
        ]
        self.weights = 1.0

    def __call__(self, x, y):
        if x.ndim == 3:
            x = x.reshape(-1, x.shape[-1])
            y = y.reshape(-1, y.shape[-1])
        sc_total = mag_total = 0.0
        for f in self.stft_losses:
            sc, mag = f(x, y)
            sc_total += sc
            mag_total += mag
        n = len(self.stft_losses)
        return sc_total / n, mag_total / n


class SeqCELoss:
    """Masked CE + error rate for Textsy-BERT (reference loss.py:444-460)."""

    def __init__(self, loss_type: str = "ce"):
        self.weights = 1.0

    def __call__(self, logits, targets, masks):
        logp = jax.nn.log_softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(targets, logits.shape[-1])
        ce = -(onehot * logp).sum(-1)
        masks = masks.astype(jnp.float32)
        denom = masks.sum()
        loss = (ce * masks).sum() / denom
        preds = jnp.argmax(logits, axis=-1)
        err = ((preds != targets).astype(jnp.float32) * masks).sum() / denom
        return loss, err


class AttentionBinarizationLoss:
    """KL between hard and soft MAS attention with epoch warmup
    (reference loss.py:463-478)."""

    def __init__(self, start_epoch: int = 0, warmup_epoch: int = 100):
        self.start_epoch = start_epoch
        self.warmup_epoch = warmup_epoch
        self.weights = 1.0

    def __call__(self, epoch, hard_attention, soft_attention, eps: float = 1e-12):
        log_sum = jnp.sum(
            jnp.log(jnp.clip(soft_attention, eps, None)) * hard_attention
        )
        kl = -log_sum / hard_attention.sum()
        warmup = jnp.clip(
            (epoch - self.start_epoch) / self.warmup_epoch, 0.0, 1.0
        ) * (epoch >= self.start_epoch)
        return kl * warmup


class AttentionCTCLoss:
    """Monotonic-alignment CTC over attention logprobs, batched via optax
    (reference loss.py:481-508 runs a per-sample python loop; here it's one
    vectorized ctc_loss call)."""

    def __init__(self, blank_logprob: float = -1.0):
        self.blank_logprob = blank_logprob
        self.weights = 1.0

    def __call__(self, attn_logprob, in_lens, out_lens):
        """attn_logprob: (B, 1, T_mel, T_text)."""
        B, _, T_mel, T_text = attn_logprob.shape
        logits = attn_logprob[:, 0]  # (B, T_mel, T_text)
        # prepend blank class (id 0); text tokens become classes 1..T_text
        logits = jnp.pad(logits, ((0, 0), (0, 0), (1, 0)),
                         constant_values=self.blank_logprob)
        # the reference log-softmaxes after masking to key_len+1; mask padded
        # text classes before normalization
        cls = jnp.arange(T_text + 1)[None, None, :]
        logits = jnp.where(cls <= in_lens[:, None, None], logits, -1e9)
        logp = jax.nn.log_softmax(logits, axis=-1)

        labels = jnp.tile(jnp.arange(1, T_text + 1)[None, :], (B, 1))
        label_paddings = (labels > in_lens[:, None]).astype(jnp.float32)
        t = jnp.arange(T_mel)[None, :]
        logit_paddings = (t >= out_lens[:, None]).astype(jnp.float32)
        per_seq = optax.ctc_loss(logp, logit_paddings, labels, label_paddings)
        # torch CTCLoss(reduction='mean') normalizes by target length; the
        # reference calls it per-sample then averages (loss.py:495-508)
        return jnp.mean(per_seq / in_lens.astype(jnp.float32))


loss_dict = {
    "generator_adv_loss": GeneratorAdversarialLoss,
    "discriminator_adv_loss": DiscriminatorAdversarialLoss,
    "stft_loss": MultiResolutionSTFTLoss,
    "mel_loss": MelSpectrogramLoss,
    "subband_stft_loss": MultiResolutionSTFTLoss,
    "feat_match_loss": FeatureMatchLoss,
    "MelReconLoss": MelReconLoss,
    "ProsodyReconLoss": ProsodyReconLoss,
    "SeqCELoss": SeqCELoss,
    "AttentionBinarizationLoss": AttentionBinarizationLoss,
    "AttentionCTCLoss": AttentionCTCLoss,
    "FpCELoss": FpCELoss,
}


def criterion_builder(config: Dict[str, Any]) -> Dict[str, Any]:
    """Build enabled criteria from config["Loss"], attaching ``weights``
    (reference loss.py:528-544)."""
    criterion = {}
    for key, value in config["Loss"].items():
        if key not in loss_dict:
            raise NotImplementedError(f"{key} is not implemented")
        if value.get("enable", False):
            crit = loss_dict[key](**value.get("params", {}))
            crit.weights = value.get("weights", 1.0)
            criterion[key] = crit
    return criterion
