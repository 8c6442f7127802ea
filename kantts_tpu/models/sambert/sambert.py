"""KanTtsSAMBERT acoustic model (Flax/linen, TPU-native).

Parity target: /root/reference/kantts/models/sambert/kantts_sambert.py:712-1068.

Pipeline (training forward, one XLA program):
  TextFftEncoder -> (optional MAS ConvAttention + in-graph Viterbi binarize)
  -> emotion/speaker embeddings -> VarianceAdaptor (pitch/energy FSMN+BiLSTM
  predictors, teacher-forced AR duration LSTM, matmul LengthRegulator)
  -> LFR regroup (r = outputs_per_step) -> memory concat -> banded PNCA
  decoder (teacher-forced parallel) -> de-LFR -> FSMN+LSTM PostNet residual.

Inference is driven by ``sambert_infer``: the duration predictor's
autoregressive loop and the PNCA decoder's frame loop are both lax.scan —
no python-per-step loops (reference hot spots kantts_sambert.py:569-611 and
adaptors.py:67-83).

Static-shape contract (TPU-first): all sequence dims are padded/bucketed by
the caller; mel length must be a multiple of r; durations (targets) must sum
to the padded mel length per item (the data pipeline guarantees both, as the
reference's Padder does).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kantts_tpu.models.sambert.adaptors import (
    VarFsmnRnnNARPredictor,
    VarRnnARPredictor,
    length_regulate,
)
from kantts_tpu.models.sambert.alignment import mas_align
from kantts_tpu.models.sambert.attention import ConvAttention
from kantts_tpu.models.sambert.common import FFTBlock, conv1d_same, torch_linear
from kantts_tpu.models.sambert.fp import apply_fp_insertion
from kantts_tpu.models.sambert.fsmn import FsmnEncoderV2
from kantts_tpu.models.sambert.lstm import LSTM
from kantts_tpu.models.sambert.pnca import MelPNCADecoder, pnca_decoder_infer
from kantts_tpu.models.sambert.positions import (
    add_sinusoidal_position,
    duration_position_encoding,
)
from kantts_tpu.utils.mask import get_mask_from_lengths


def _embed(num: int, dim: int, name: str) -> nn.Embed:
    return nn.Embed(num, dim, embedding_init=nn.initializers.normal(1.0), name=name)


def compute_dtype(cfg: Dict[str, Any]):
    """Mixed-precision compute dtype for the transformer stacks (params and
    LN/softmax stay f32); set ``compute_dtype: bfloat16`` in the model params
    (or ``mixed_precision: true`` at the config top level)."""
    name = cfg.get("compute_dtype")
    return {None: None, "float32": None,
            "bfloat16": jnp.bfloat16}[name]


class SelfAttentionEncoder(nn.Module):
    """N FFT blocks with sinusoidal positions and a final LN
    (reference kantts_sambert.py:22-87)."""

    n_layer: int
    d_model: int
    n_head: int
    d_head: int
    d_inner: int
    dropout: float
    dropout_att: float
    dropout_relu: float
    max_len: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True,
                 return_attns: bool = False):
        x = x * float(np.sqrt(self.d_model))
        x = add_sinusoidal_position(x, self.max_len)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)

        T = x.shape[1]
        slf_attn_mask = (
            jnp.broadcast_to(mask[:, None, :], (mask.shape[0], T, T))
            if mask is not None else None
        )
        attns = []
        h = x
        for i in range(self.n_layer):
            h, attn = FFTBlock(
                self.d_model, self.n_head, self.d_head, self.d_inner, (3, 1),
                self.dropout, self.dropout_att, self.dropout_relu,
                dtype=self.dtype, name=f"fft_{i}",
            )(h, mask, slf_attn_mask, deterministic)
            if return_attns:
                attns.append(attn)
        h = nn.LayerNorm(epsilon=1e-6, name="ln")(h.astype(jnp.float32))
        return h, attns


class TextFftEncoder(nn.Module):
    """4-way summed linguistic embeddings (or byte embedding) + encoder +
    projection (reference kantts_sambert.py:256-337)."""

    config: Dict[str, Any]
    use_projection: bool = True

    @nn.compact
    def __call__(self, inputs_ling, masks=None, deterministic: bool = True,
                 return_attns: bool = False):
        cfg = self.config
        d_emb = cfg["embedding_dim"]
        if cfg.get("using_byte", False):
            ling_embedding = _embed(cfg["byte_index"], d_emb, "byte_index_emb")(
                inputs_ling[:, :, 0]
            )
        else:
            ling_embedding = (
                _embed(cfg["sy"], d_emb, "sy_emb")(inputs_ling[:, :, 0])
                + _embed(cfg["tone"], d_emb, "tone_emb")(inputs_ling[:, :, 1])
                + _embed(cfg["syllable_flag"], d_emb, "syllable_flag_emb")(
                    inputs_ling[:, :, 2]
                )
                + _embed(cfg["word_segment"], d_emb, "ws_emb")(inputs_ling[:, :, 3])
            )

        d_model = cfg["encoder_num_units"]
        enc_output, attns = SelfAttentionEncoder(
            n_layer=cfg["encoder_num_layers"],
            d_model=d_model,
            n_head=cfg["encoder_num_heads"],
            d_head=d_model // cfg["encoder_num_heads"],
            d_inner=cfg["encoder_ffn_inner_dim"],
            dropout=cfg["encoder_dropout"],
            dropout_att=cfg["encoder_attention_dropout"],
            dropout_relu=cfg["encoder_relu_dropout"],
            max_len=cfg["max_len"],
            dtype=compute_dtype(cfg),
            name="ling_enc",
        )(ling_embedding, masks, deterministic, return_attns)

        if self.use_projection:
            enc_output = torch_linear(
                cfg["encoder_projection_units"], use_bias=False, name="ling_proj"
            )(enc_output)
        # The reference's SelfAttentionEncoder scales its input IN PLACE
        # (``input *= d_model ** 0.5``, kantts_sambert.py:63), which aliases
        # the ling_embedding tensor the caller later feeds to the MAS
        # ConvAttention — so the reference's MAS keys are the embeddings
        # scaled by sqrt(d_model). Reproduce that exact behavior.
        return enc_output, attns, ling_embedding * float(np.sqrt(d_model))


class PostNet(nn.Module):
    """FSMN (lookahead shift) -> uni-LSTM -> FC mel residual
    (reference kantts_sambert.py:615-649)."""

    config: Dict[str, Any]

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        cfg = self.config
        h = FsmnEncoderV2(
            cfg["postnet_filter_size"], cfg["postnet_fsmn_num_layers"],
            cfg["postnet_num_memory_units"], cfg["postnet_ffn_inner_dim"],
            cfg["postnet_dropout"], cfg["postnet_shift"], name="fsmn",
        )(x, mask, deterministic)
        h, _ = LSTM(cfg["postnet_lstm_units"], name="lstm")(h)
        return torch_linear(cfg["num_mels"], name="fc")(h)


class FP_Predictor(nn.Module):
    """4-class filled-pause head over encoder states
    (reference kantts_sambert.py:677-709)."""

    config: Dict[str, Any]

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        # the reference hardcodes Dropout(0.1); fp_dropout exists so parity
        # harnesses can zero it for deterministic cross-stack trajectories
        p_drop = cfg.get("fp_dropout", 0.1)
        h = conv1d_same(cfg["embedding_dim"] // 2, 3, name="w_1")(x)
        h = jax.nn.relu(h)
        h = nn.LayerNorm(epsilon=1e-6, name="layer_norm1")(h)
        h = nn.Dropout(p_drop, deterministic=deterministic)(h)
        h = conv1d_same(cfg["encoder_projection_units"], 1, name="w_2")(h)
        h = jax.nn.relu(h)
        h = nn.LayerNorm(epsilon=1e-6, name="layer_norm2")(h)
        h = nn.Dropout(p_drop, deterministic=deterministic)(h)
        return jax.nn.softmax(torch_linear(4, name="fc")(h), axis=-1)


def average_frame_feat(feat: jnp.ndarray, durs: jnp.ndarray) -> jnp.ndarray:
    """Mean of NONZERO frame values within each token's duration span
    (reference kantts_sambert.py:652-674). feat: (B, T_mel); durs: (B, T_in)."""
    T_mel = feat.shape[1]
    ends = jnp.clip(jnp.cumsum(durs.astype(jnp.int32), axis=1), 0, T_mel)
    starts = jnp.pad(ends[:, :-1], ((0, 0), (1, 0)))
    nz_cums = jnp.pad(jnp.cumsum((feat != 0.0).astype(jnp.float32), axis=1),
                      ((0, 0), (1, 0)))
    f_cums = jnp.pad(jnp.cumsum(feat, axis=1), ((0, 0), (1, 0)))
    sums = jnp.take_along_axis(f_cums, ends, axis=1) - jnp.take_along_axis(
        f_cums, starts, axis=1
    )
    nelems = jnp.take_along_axis(nz_cums, ends, axis=1) - jnp.take_along_axis(
        nz_cums, starts, axis=1
    )
    return jnp.where(nelems == 0.0, 0.0, sums / jnp.where(nelems == 0, 1.0, nelems))


def make_mel_decoder(cfg: Dict[str, Any]) -> MelPNCADecoder:
    """Standalone decoder definition (shared by training model and the scan
    inference driver; the driver applies it against the model's
    ``mel_decoder`` param subtree)."""
    r = cfg["outputs_per_step"]
    d_mem = (cfg["encoder_projection_units"] * r + cfg["emotion_units"]
             + cfg["speaker_units"])
    return MelPNCADecoder(
        prenet_units=tuple(cfg["decoder_prenet_units"]),
        nb_layers=cfg["decoder_num_layers"],
        nb_heads=cfg["decoder_num_heads"],
        d_model=cfg["decoder_num_units"],
        d_inner=cfg["decoder_ffn_inner_dim"],
        d_mem=d_mem,
        d_mel=cfg["num_mels"],
        r=r,
        dropout=cfg["decoder_dropout"],
        dropout_attn=cfg["decoder_attention_dropout"],
        dropout_relu=cfg["decoder_relu_dropout"],
        dtype=compute_dtype(cfg),
    )


class KanTtsSAMBERT(nn.Module):
    """Full SAM-BERT acoustic model (reference kantts_sambert.py:712-1044)."""

    config: Dict[str, Any]

    def setup(self):
        cfg = self.config
        self.text_encoder = TextFftEncoder(cfg)
        self.se_enable = cfg.get("SE", False)
        if not self.se_enable:
            self.spk_tokenizer = _embed(cfg["speaker"], cfg["speaker_units"],
                                        "spk_tokenizer")
        self.emo_tokenizer = _embed(cfg["emotion"], cfg["emotion_units"],
                                    "emo_tokenizer")

        var_in = (cfg["encoder_projection_units"] + cfg["emotion_units"]
                  + cfg["speaker_units"])
        self.pitch_predictor = VarFsmnRnnNARPredictor(
            cfg["predictor_filter_size"], cfg["predictor_fsmn_num_layers"],
            cfg["predictor_num_memory_units"], cfg["predictor_ffn_inner_dim"],
            cfg["predictor_dropout"], cfg["predictor_shift"],
            cfg["predictor_lstm_units"],
        )
        self.energy_predictor = VarFsmnRnnNARPredictor(
            cfg["predictor_filter_size"], cfg["predictor_fsmn_num_layers"],
            cfg["predictor_num_memory_units"], cfg["predictor_ffn_inner_dim"],
            cfg["predictor_dropout"], cfg["predictor_shift"],
            cfg["predictor_lstm_units"],
        )
        self.duration_predictor = VarRnnARPredictor(
            tuple(cfg["dur_pred_prenet_units"]), cfg["dur_pred_lstm_units"],
            fc_bias_init=float(cfg.get("dur_pred_bias_init", 0.0)),
        )
        self.pitch_emb = conv1d_same(cfg["encoder_projection_units"], 9)
        self.energy_emb = conv1d_same(cfg["encoder_projection_units"], 9)

        self.r = cfg["outputs_per_step"]
        self.d_mel = cfg["num_mels"]
        self.mel_decoder = make_mel_decoder(cfg)
        self.mel_postnet = PostNet(cfg)

        self.mas_enable = cfg.get("MAS", False)
        if self.mas_enable:
            self.align_attention = ConvAttention(
                n_mel_channels=cfg["num_mels"],
                n_text_channels=cfg["embedding_dim"],
                n_att_channels=cfg["num_mels"],
            )
        self.fp_enable = cfg.get("FP", False)
        if self.fp_enable:
            self.FP_predictor = FP_Predictor(self.config)

    # ----------------------------------------------------------- sub-passes

    def encode(self, inputs_ling, input_masks, deterministic: bool = True):
        return self.text_encoder(inputs_ling, input_masks, deterministic, True)

    def tokenize(self, inputs_emotion, inputs_speaker):
        emo_hid = self.emo_tokenizer(inputs_emotion)
        spk_hid = (inputs_speaker if self.se_enable
                   else self.spk_tokenizer(inputs_speaker))
        return emo_hid, spk_hid

    def variance_pre(self, text_hid, emo_hid, spk_hid, masks,
                     pitch_targets=None, energy_targets=None,
                     deterministic: bool = True):
        """Everything before the AR duration loop: NAR pitch/energy prediction
        and the pitch/energy-augmented text encoding + duration condition
        (reference kantts_sambert.py:408-441)."""
        var_inputs = jnp.concatenate([text_hid, spk_hid, emo_hid], axis=-1)
        pitch_predictions = self.pitch_predictor(var_inputs, masks,
                                                 deterministic=deterministic)
        energy_predictions = self.energy_predictor(var_inputs, masks,
                                                   deterministic=deterministic)
        pitch_src = pitch_targets if pitch_targets is not None else pitch_predictions
        energy_src = energy_targets if energy_targets is not None else energy_predictions
        text_aug = (
            text_hid
            + self.pitch_emb(pitch_src[..., None])
            + self.energy_emb(energy_src[..., None])
        )
        dur_cond = jnp.concatenate([text_aug, spk_hid, emo_hid], axis=-1)
        return pitch_predictions, energy_predictions, text_aug, dur_cond

    def duration_teacher(self, duration_targets, dur_cond, masks,
                         deterministic: bool = True):
        """Teacher-forced parallel duration pass
        (reference kantts_sambert.py:442-455)."""
        B = duration_targets.shape[0]
        go = jnp.zeros((B, 1), dtype=jnp.float32)
        shifted = jnp.concatenate(
            [go, duration_targets[:, :-1].astype(jnp.float32)], axis=1
        )
        dur_in = jnp.log(shifted + 1.0)
        log_dur, _ = self.duration_predictor(
            dur_in[..., None], dur_cond, masks=masks, deterministic=deterministic
        )
        return log_dur

    def duration_step(self, prev_x, cond_t, state):
        """One AR duration step for the lax.scan infer driver.
        prev_x: (B, 1); cond_t: (B, 1, C); state: LSTM carry."""
        out, new_state = self.duration_predictor(
            prev_x[..., None], cond_t, state=state, deterministic=True
        )
        return out[:, 0], new_state

    def build_memory(self, LR_text, LR_emo, LR_spk):
        """LFR regroup + memory concat (reference kantts_sambert.py:969-979)."""
        B, T_mel, _ = LR_text.shape
        r = self.r
        lfr_text = LR_text.reshape(B, T_mel // r, r * LR_text.shape[-1])
        lfr_emo = LR_emo.reshape(B, T_mel // r, r * LR_emo.shape[-1])[
            :, :, : LR_emo.shape[-1]
        ]
        lfr_spk = LR_spk.reshape(B, T_mel // r, r * LR_spk.shape[-1])[
            :, :, : LR_spk.shape[-1]
        ]
        return jnp.concatenate([lfr_text, lfr_spk, lfr_emo], axis=-1)

    def decode_postnet(self, dec_outputs, output_masks, deterministic: bool = True):
        """De-LFR + postnet residual (reference kantts_sambert.py:1004-1014)."""
        B = dec_outputs.shape[0]
        dec = dec_outputs.reshape(B, -1, self.d_mel)
        if output_masks is not None:
            dec = jnp.where(output_masks[..., None], 0.0, dec)
        post = self.mel_postnet(dec, output_masks, deterministic) + dec
        if output_masks is not None:
            post = jnp.where(output_masks[..., None], 0.0, post)
        return dec, post

    # ------------------------------------------------------------- training

    def __call__(
        self,
        inputs_ling: jnp.ndarray,
        inputs_emotion: jnp.ndarray,
        inputs_speaker: jnp.ndarray,
        input_lengths: jnp.ndarray,
        output_lengths: jnp.ndarray,
        mel_targets: jnp.ndarray,
        duration_targets: Optional[jnp.ndarray] = None,
        pitch_targets: Optional[jnp.ndarray] = None,
        energy_targets: Optional[jnp.ndarray] = None,
        attn_priors: Optional[jnp.ndarray] = None,
        fp_label: Optional[jnp.ndarray] = None,
        fp_plan: Optional[Tuple[jnp.ndarray, ...]] = None,
        fp_dict_lings: Optional[jnp.ndarray] = None,
        deterministic: bool = False,
        ss_prob: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        """Teacher-forced training forward. Shapes are static; mel length is a
        multiple of r; durations sum to the padded mel length per item."""
        B, T_in = inputs_ling.shape[:2]
        T_mel = mel_targets.shape[1]
        r = self.r

        input_masks = get_mask_from_lengths(input_lengths, T_in)
        text_hid, enc_attns, ling_emb = self.encode(
            inputs_ling, input_masks, deterministic
        )

        res: Dict[str, Any] = {"enc_slf_attn_lst": enc_attns}

        inter_lengths = input_lengths
        fp_p = None
        if self.fp_enable:
            fp_p = self.FP_predictor(text_hid, deterministic)
            if fp_plan is not None:
                # splice encoded filler syllables into the text hiddens
                # (reference insert_fp, kantts_sambert.py:766-860; the plan is
                # host-built — see models/sambert/fp.py)
                src_idx, filler_class, filler_phase, plan_lengths = fp_plan
                filler_bank, _, _ = self.encode(
                    fp_dict_lings, None, deterministic
                )  # (3 classes, 3 phases, D)
                text_hid = apply_fp_insertion(
                    text_hid, filler_bank, src_idx, filler_class, filler_phase
                )
                L = text_hid.shape[1]
                wrap = jnp.arange(L) % T_in
                inputs_emotion = inputs_emotion[:, wrap]
                inputs_speaker = (inputs_speaker[:, wrap]
                                  if inputs_speaker.ndim == 2
                                  else inputs_speaker[:, wrap, :])
                inter_lengths = plan_lengths

        if self.mas_enable:
            attn_soft, attn_logprob = self.align_attention(
                mel_targets, ling_emb, input_masks, attn_priors
            )
            # stop_gradient on the INPUT keeps the (non-differentiable) MAS
            # kernel entirely outside the autodiff trace
            attn_hard = mas_align(
                jax.lax.stop_gradient(attn_soft), input_lengths, output_lengths
            )
            mas_durations = attn_hard.sum(axis=2)[:, 0, :]  # (B, T_in)
            duration_targets = mas_durations
            pitch_targets = average_frame_feat(pitch_targets, duration_targets)
            energy_targets = average_frame_feat(energy_targets, duration_targets)
            # stash the mel padding on the EOS slot so durations sum to T_mel
            # (reference kantts_sambert.py:921-925)
            pad_amount = (T_mel - output_lengths).astype(duration_targets.dtype)
            duration_targets = duration_targets.at[
                jnp.arange(B), input_lengths
            ].set(pad_amount)
            res.update(attn_soft=attn_soft, attn_hard=attn_hard,
                       attn_logprob=attn_logprob)

        emo_hid, spk_hid = self.tokenize(inputs_emotion, inputs_speaker)
        inter_masks = get_mask_from_lengths(inter_lengths, text_hid.shape[1])
        output_masks = get_mask_from_lengths(output_lengths, T_mel)

        (pitch_predictions, energy_predictions, text_aug,
         dur_cond) = self.variance_pre(
            text_hid, emo_hid, spk_hid, inter_masks,
            pitch_targets, energy_targets, deterministic,
        )
        log_duration_predictions = self.duration_teacher(
            duration_targets, dur_cond, inter_masks, deterministic
        )

        LR_text, LR_length = length_regulate(
            text_aug, duration_targets, T_mel, output_masks
        )
        LR_pos = duration_position_encoding(
            duration_targets, text_aug.shape[-1], T_mel, output_masks
        )
        LR_emo, _ = length_regulate(emo_hid, duration_targets, T_mel, output_masks)
        LR_spk, _ = length_regulate(spk_hid, duration_targets, T_mel, output_masks)
        LR_text = LR_text + LR_pos

        memory = self.build_memory(LR_text, LR_emo, LR_spk)

        masked_dur = jnp.where(inter_masks, 0.0, duration_targets.astype(jnp.float32))
        x_band_width = jnp.floor(masked_dur.max() / r + 0.5).astype(jnp.int32)
        h_band_width = x_band_width

        lfr_lengths = (output_lengths + r - 1) // r
        lfr_masks = get_mask_from_lengths(lfr_lengths, T_mel // r)

        dec_in = mel_targets
        if ss_prob is not None:
            # Scheduled sampling (two-pass): at inference the decoder feeds
            # back its OWN coarse frames (pnca.py decode driver), but teacher
            # forcing always shows it ground truth — the exposure-bias root
            # of the TF->free-running MCD gap. Pass 1 (gradient-stopped)
            # produces the model's coarse frames; the prev-mel input of pass
            # 2 swaps ground truth for them on Bernoulli(ss_prob)-sampled
            # LFR groups. Only pass 2 takes gradient.
            dec1, _, _ = self.mel_decoder(
                memory, x_band_width, h_band_width, mel_targets, lfr_masks,
                deterministic, return_attns=False,
            )
            own = jax.lax.stop_gradient(dec1).reshape(B, T_mel, self.d_mel)
            take = jax.random.bernoulli(
                self.make_rng("dropout"), ss_prob, (B, T_mel // r))
            take = jnp.repeat(take, r, axis=1)[..., None]
            dec_in = jnp.where(take, own.astype(mel_targets.dtype), mel_targets)

        dec_outputs, pnca_x_attn, pnca_h_attn = self.mel_decoder(
            memory, x_band_width, h_band_width, dec_in, lfr_masks,
            deterministic, return_attns=True,
        )
        dec, post = self.decode_postnet(dec_outputs, output_masks, deterministic)

        res.update(
            x_band_width=x_band_width,
            h_band_width=h_band_width,
            pnca_x_attn_lst=pnca_x_attn,
            pnca_h_attn_lst=pnca_h_attn,
            dec_outputs=dec,
            postnet_outputs=post,
            LR_length_rounded=LR_length,
            log_duration_predictions=log_duration_predictions,
            pitch_predictions=pitch_predictions,
            energy_predictions=energy_predictions,
            duration_targets=duration_targets,
            pitch_targets=pitch_targets,
            energy_targets=energy_targets,
            fp_predictions=fp_p,
            valid_inter_lengths=inter_lengths,
            LR_text_outputs=LR_text,
            LR_emo_outputs=LR_emo,
            LR_spk_outputs=LR_spk,
        )
        return res


class KanTtsTextsyBERT(nn.Module):
    """Masked-LM over the sy track (reference kantts_sambert.py:1047-1068)."""

    config: Dict[str, Any]

    @nn.compact
    def __call__(self, inputs_ling, input_lengths, deterministic: bool = True):
        input_masks = get_mask_from_lengths(input_lengths, inputs_ling.shape[1])
        text_hid, attns, _ = TextFftEncoder(
            self.config, use_projection=False, name="text_encoder"
        )(inputs_ling, input_masks, deterministic, True)
        logits = torch_linear(self.config["sy"], name="fc")(text_hid)
        return {"logits": logits, "enc_slf_attn_lst": attns}


# -------------------------------------------------------------------- infer


def sambert_infer_fp(
    model: KanTtsSAMBERT,
    variables,
    inputs_ling: jnp.ndarray,
    inputs_emotion: jnp.ndarray,
    inputs_speaker: jnp.ndarray,
    input_lengths: jnp.ndarray,
    fp_dict_lings: jnp.ndarray,
    max_output_len: int,
) -> Dict[str, jnp.ndarray]:
    """FP-mode inference: predict filled-pause classes, splice the encoded
    filler triples on the host (reference kantts_sambert.py:786-860 with
    FP_p-derived fp_mask), then run the standard acoustic inference on the
    augmented sequence via a pre-encoded text-hidden override."""
    import numpy as np

    from kantts_tpu.models.sambert.fp import (
        apply_fp_insertion,
        build_fp_insertion_plan,
        fp_classes_from_predictions,
    )

    B, T_in = inputs_ling.shape[:2]
    input_masks = get_mask_from_lengths(input_lengths, T_in)
    text_hid, _, _ = model.apply(
        variables, inputs_ling, input_masks, True, method=KanTtsSAMBERT.encode
    )
    fp_p = model.apply(
        variables, text_hid, True,
        method=lambda m, h, det: m.FP_predictor(h, det),
    )
    fp_classes = fp_classes_from_predictions(np.asarray(fp_p),
                                             np.asarray(input_masks))
    src_idx, f_class, f_phase, inter_lengths, L = build_fp_insertion_plan(
        fp_classes, np.asarray(input_lengths)
    )
    filler_bank, _, _ = model.apply(
        variables, fp_dict_lings, None, True, method=KanTtsSAMBERT.encode
    )
    text_hid_aug = apply_fp_insertion(
        text_hid, filler_bank, jnp.asarray(src_idx), jnp.asarray(f_class),
        jnp.asarray(f_phase),
    )
    wrap = np.arange(L) % T_in
    emo_aug = jnp.asarray(np.asarray(inputs_emotion)[:, wrap])
    spk = np.asarray(inputs_speaker)
    spk_aug = jnp.asarray(spk[:, wrap] if spk.ndim == 2 else spk[:, wrap, :])

    res = sambert_infer(
        model, variables, inputs_ling, emo_aug, spk_aug,
        jnp.asarray(inter_lengths), max_output_len,
        text_hid_override=text_hid_aug,
    )
    res["fp_predictions"] = fp_p
    res["valid_inter_lengths"] = jnp.asarray(inter_lengths)
    return res


def sambert_infer(
    model: KanTtsSAMBERT,
    variables,
    inputs_ling: jnp.ndarray,
    inputs_emotion: jnp.ndarray,
    inputs_speaker: jnp.ndarray,
    input_lengths: jnp.ndarray,
    max_output_len: int,
    text_hid_override: Optional[jnp.ndarray] = None,
    duration_override: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Full acoustic inference: text -> mel. Jittable end-to-end.

    max_output_len: static output frame budget (multiple of r). Valid length
    is returned as LR_length_rounded (reference am_synthesis slices to it,
    bin/infer_sambert.py:136-138). ``text_hid_override`` feeds an externally
    prepared text-hidden sequence (the FP insertion path).
    ``duration_override`` (B, T_in) frames-per-phone replaces the AR duration
    decode for duration-controlled synthesis (and for alignment-injection
    analysis, tools/mas_gap_analysis.py); the duration head still runs and
    its predictions are still returned.
    """
    cfg = model.config
    r = cfg["outputs_per_step"]
    assert max_output_len % r == 0

    if text_hid_override is not None:
        text_hid = text_hid_override
        B, T_in = text_hid.shape[:2]
        input_masks = get_mask_from_lengths(input_lengths, T_in)
    else:
        B, T_in = inputs_ling.shape[:2]
        input_masks = get_mask_from_lengths(input_lengths, T_in)
        text_hid, _, _ = model.apply(
            variables, inputs_ling, input_masks, True,
            method=KanTtsSAMBERT.encode,
        )
    emo_hid, spk_hid = model.apply(
        variables, inputs_emotion, inputs_speaker, method=KanTtsSAMBERT.tokenize
    )
    pitch_pred, energy_pred, text_aug, dur_cond = model.apply(
        variables, text_hid, emo_hid, spk_hid, input_masks,
        method=KanTtsSAMBERT.variance_pre,
    )

    # ---- AR duration decode as lax.scan (reference adaptors.py:67-83)
    lstm_h = jnp.zeros((2, B, cfg["dur_pred_lstm_units"]), dtype=text_hid.dtype)
    lstm_c = jnp.zeros_like(lstm_h)

    def dur_body(carry, t):
        prev_x, state = carry
        cond_t = jax.lax.dynamic_slice_in_dim(dur_cond, t, 1, axis=1)
        out, new_state = model.apply(
            variables, prev_x, cond_t, state, method=KanTtsSAMBERT.duration_step
        )  # out: (B,)
        return (out[:, None], new_state), out

    go = jnp.zeros((B, 1), dtype=text_hid.dtype)
    (_, _), log_dur = jax.lax.scan(
        dur_body, (go, (lstm_h, lstm_c)), jnp.arange(T_in),
        # launch-bound (tiny LSTM per step); trace-time tunable like the
        # mel decode scan
        unroll=min(int(os.environ.get("KANTTS_DUR_UNROLL", "8")), T_in),
    )
    log_duration_predictions = jnp.where(input_masks, 0.0, log_dur.T)  # (B, T_in)
    duration_predictions = jnp.exp(log_duration_predictions) - 1.0
    duration_predictions = jnp.where(input_masks, 0.0, duration_predictions)
    if duration_override is not None:
        duration_predictions = jnp.where(
            input_masks, 0.0, duration_override.astype(duration_predictions.dtype)
        )

    # ---- length regulation at static budget
    LR_text, LR_length = length_regulate(text_aug, duration_predictions,
                                         max_output_len)
    LR_length = jnp.minimum(LR_length, max_output_len)
    LR_pos = duration_position_encoding(duration_predictions,
                                        text_aug.shape[-1], max_output_len)
    LR_emo, _ = length_regulate(emo_hid, duration_predictions, max_output_len)
    LR_spk, _ = length_regulate(spk_hid, duration_predictions, max_output_len)
    LR_text = LR_text + LR_pos

    memory = model.apply(
        variables, LR_text, LR_emo, LR_spk, method=KanTtsSAMBERT.build_memory
    )

    # PNCA band widths from predicted durations (reference am_synthesis
    # computes them per utterance at B=1, kantts_sambert.py:569-584). For
    # batched inference use PER-ITEM widths — shaped (B,1,1,1) they broadcast
    # through the step masks — so each utterance sees exactly the mask its
    # own B=1 run would (batch composition cannot change synthesis). The
    # B == 1 branch is trace-time: single-utterance programs are unchanged.
    if B == 1:
        x_band_width = jnp.floor(
            duration_predictions.max() / r + 0.5).astype(jnp.int32)
        bw_step = x_band_width
    else:
        x_band_width = jnp.floor(
            duration_predictions.max(axis=1) / r + 0.5).astype(jnp.int32)
        bw_step = x_band_width.reshape(B, 1, 1, 1)
    h_band_width = x_band_width

    output_masks = get_mask_from_lengths(LR_length, max_output_len)
    lfr_lengths = (LR_length + r - 1) // r
    mem_pad_mask = get_mask_from_lengths(lfr_lengths, max_output_len // r)

    decoder_def = make_mel_decoder(cfg)
    dec_outputs = pnca_decoder_infer(
        decoder_def,
        {"params": variables["params"]["mel_decoder"]},
        memory, bw_step, bw_step, mem_pad_mask,
        # trace-time tunable: the scan is launch-bound, so deeper unrolls
        # trade compile time for step-dispatch amortization (12 is the
        # measured sweet spot on v5e: 22.4k vs 21.2k frames/s at 4; 8 and 16
        # both regress — see PERFORMANCE.md)
        unroll=int(os.environ.get("KANTTS_DECODE_UNROLL", "12")),
    )

    dec, post = model.apply(
        variables, dec_outputs, output_masks, True,
        method=KanTtsSAMBERT.decode_postnet,
    )

    return {
        "dec_outputs": dec,
        "postnet_outputs": post,
        "LR_length_rounded": LR_length,
        "log_duration_predictions": log_duration_predictions,
        "duration_predictions": duration_predictions,
        "pitch_predictions": pitch_pred,
        "energy_predictions": energy_pred,
        "x_band_width": x_band_width,
        "h_band_width": h_band_width,
    }
