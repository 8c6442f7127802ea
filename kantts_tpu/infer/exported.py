"""Serving artifacts: ahead-of-time exported TTS programs (``jax.export``).

The reference deploys by shipping torch checkpoints that every serving host
re-loads into Python model code (the modelscope pipeline re-instantiates
KanTtsSAMBERT + Generator and traces them at first use). On TPU the natural
deployment unit is the *compiled program*: ``jax.export`` serializes the
lowered StableHLO of the fused text-to-wav program (infer/e2e.py) with
versioned compatibility guarantees, so a serving host needs only jax and the
artifact — no model code, no config plumbing, no Python-level tracing at
startup — and one artifact runs on both CPU and TPU (multi-platform lowering).

Artifact layout (a directory)::

    program.jaxexp     serialized jax.export.Exported (StableHLO bytes)
    weights.msgpack    {"am": am_variables, "voc": voc_variables}
    config.yaml        the stamped AM config (drives the linguistic unit)
    meta.json          static shapes, hop, sampling rate, flags

The program keeps the weights as *arguments* (not baked constants): the
artifact stays small, and a fine-tuned checkpoint can be swapped in without
re-exporting as long as the architecture is unchanged.

Reference capability parity: text -> wav synthesis as deployed by
/root/reference/kantts/bin/text_to_wav.py:71-117, packaged for serving.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


PROGRAM_FILE = "program.jaxexp"
WEIGHTS_FILE = "weights.msgpack"
CONFIG_FILE = "config.yaml"
META_FILE = "meta.json"


def _shape_structs(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), tree)


def export_fused_tts(
    am_ckpt: str,
    voc_ckpt: str,
    out_dir: str,
    max_input_len: int = 96,
    max_output_len: Optional[int] = None,
    n_chunks: int = 0,
    frames_per_symbol: int = 24,
    platforms=("cpu", "tpu"),
    int8: bool = False,
) -> dict:
    """Export the fused symbols->waveform program as a serving artifact.

    max_input_len: static symbol budget (inputs are padded to it).
    max_output_len: static mel-frame budget; default mirrors am_synthesis's
        ``ceil(L_in * frames_per_symbol / r) * r`` (bin/infer_sambert.py).
    n_chunks: route the vocoder epilogue through the chunked-batch path
        (causal fullband generators only; waveform-identical, better MXU
        occupancy — see infer/chunked.py).
    platforms: lowering targets; the default artifact runs on CPU and TPU.
    int8: bake the vocoder's int8-W8A8 interior convs into the artifact
        (same checkpoint; mutually exclusive with n_chunks — dynamic scales
        break chunked windowing's exactness, see infer_hifigan --int8).

    Returns the meta dict (also written to meta.json).
    """
    import jax
    import yaml
    from flax import serialization
    from jax import export as jax_export

    from kantts_tpu.bin.infer_hifigan import load_model as load_voc
    from kantts_tpu.bin.infer_sambert import load_am_checkpoint
    from kantts_tpu.infer.e2e import make_fused_infer

    am_model, am_vars, ling_unit, am_config = load_am_checkpoint(am_ckpt)
    generator, voc_vars, pqmf, voc_config = load_voc(voc_ckpt, quant=int8)
    if pqmf is not None:
        raise ValueError(
            "export_fused_tts supports fullband generators only "
            "(out_channels=1); multiband serving should export the mel "
            "program and run PQMF synthesis host-side")
    if int8 and n_chunks:
        raise ValueError("int8 and the chunked epilogue are mutually "
                         "exclusive (see infer_hifigan --int8)")

    r = am_model.config["outputs_per_step"]
    if max_output_len is None:
        max_output_len = int(
            np.ceil(max_input_len * frames_per_symbol / r) * r)
    if max_output_len % r:
        raise ValueError(f"max_output_len must be a multiple of r={r}")

    fn = make_fused_infer(am_model, generator, max_output_len,
                          n_chunks=n_chunks)

    se_enable = bool(am_model.config.get("SE", False))
    n_ling = 1 if ling_unit.using_byte() else 4
    if se_enable:
        se_dim = int(am_model.config["speaker_units"])
        spk_struct = jax.ShapeDtypeStruct((1, max_input_len, se_dim),
                                          np.float32)
    else:
        spk_struct = jax.ShapeDtypeStruct((1, max_input_len), np.int32)

    exp = jax_export.export(fn, platforms=tuple(platforms))(
        _shape_structs(am_vars),
        _shape_structs(voc_vars),
        jax.ShapeDtypeStruct((1, max_input_len, n_ling), np.int32),
        jax.ShapeDtypeStruct((1, max_input_len), np.int32),
        spk_struct,
        jax.ShapeDtypeStruct((1,), np.int32),
        _shape_structs(jax.random.PRNGKey(0)),
    )

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, PROGRAM_FILE), "wb") as f:
        f.write(exp.serialize())
    host_weights = jax.tree_util.tree_map(
        np.asarray, {"am": am_vars, "voc": voc_vars})
    with open(os.path.join(out_dir, WEIGHTS_FILE), "wb") as f:
        f.write(serialization.msgpack_serialize(host_weights))
    with open(os.path.join(out_dir, CONFIG_FILE), "w") as f:
        yaml.safe_dump(am_config, f)

    hop_total = int(np.prod(generator.upsample_scales))
    meta = {
        "kind": "fused_text_to_wav",
        "platforms": list(platforms),
        "max_input_len": int(max_input_len),
        "max_output_len": int(max_output_len),
        "n_chunks": int(n_chunks),
        "outputs_per_step": int(r),
        "n_ling": int(n_ling),
        "se_enable": se_enable,
        "se_dim": int(am_model.config["speaker_units"]) if se_enable else 0,
        "hop_total": hop_total,
        "sampling_rate": int(
            voc_config.get("audio_config", {}).get("sampling_rate", 16000)),
        "nsf_enable": bool(getattr(generator, "nsf_params", None)),
        "int8": bool(int8),
    }
    with open(os.path.join(out_dir, META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def encode_symbol_inputs(ling_unit, symbol_seq: str, max_input_len: int,
                         n_ling: int, se: Optional[np.ndarray] = None):
    """Encode one symbol sequence to padded model inputs.

    Mirrors bin/infer_sambert.py:am_synthesis (drop trailing EOS, pad each
    track with its pad id) but to a FIXED budget — exported programs are
    static-shape. Returns (ling, emo, spk, lengths)."""
    L_in = max_input_len
    feats = ling_unit.encode_symbol_sequence(symbol_seq)
    n = len(feats[0]) - 1  # drop trailing EOS (reference [:, :-1])
    if n > L_in:
        raise ValueError(f"utterance has {n} symbols > budget {L_in}")
    types = ling_unit.lfeat_type_list

    def pad_track(track, pad_id):
        return np.pad(track[:-1], (0, L_in - n), constant_values=pad_id)

    ling = np.stack(
        [pad_track(feats[i], ling_unit.pad_id(types[i]))
         for i in range(n_ling)], axis=-1)[None].astype(np.int32)
    emo = pad_track(feats[n_ling], ling_unit.pad_id(
        types[n_ling]))[None].astype(np.int32)
    if se is not None:
        spk = np.repeat(se.reshape(1, -1), L_in, axis=0)[None].astype(
            np.float32)
    else:
        spk = pad_track(feats[n_ling + 1], ling_unit.pad_id(
            types[n_ling + 1]))[None].astype(np.int32)
    lengths = np.asarray([n], dtype=np.int32)
    return ling, emo, spk, lengths


class ExportedTTS:
    """Load and run a serving artifact written by export_fused_tts.

    Needs only the artifact directory: the program is deserialized StableHLO
    (no model classes are instantiated), weights are a msgpack pytree, and
    the linguistic unit is rebuilt from the bundled config for symbol
    encoding. ``jax.jit`` around ``Exported.call`` compiles the program once
    per process; subsequent utterances reuse it.
    """

    def __init__(self, artifact_dir: str):
        import jax
        from flax import serialization
        from jax import export as jax_export

        from kantts_tpu.text.ling_unit import KanTtsLinguisticUnit
        from kantts_tpu.utils.config import load_yaml

        with open(os.path.join(artifact_dir, META_FILE)) as f:
            self.meta = json.load(f)
        with open(os.path.join(artifact_dir, PROGRAM_FILE), "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        with open(os.path.join(artifact_dir, WEIGHTS_FILE), "rb") as f:
            weights = serialization.msgpack_restore(f.read())
        self._am_vars, self._voc_vars = weights["am"], weights["voc"]
        self._config = load_yaml(os.path.join(artifact_dir, CONFIG_FILE))
        self.ling_unit = KanTtsLinguisticUnit(self._config)
        self._call = jax.jit(self._exported.call)

    def synthesize(self, symbol_seq: str, se: Optional[np.ndarray] = None,
                   rng_seed: int = 0):
        """One utterance: symbol sequence (metafile format) -> float32 wav.

        Returns (wav[n_samples], n_valid_mel_frames). Padding/encoding
        mirrors bin/infer_sambert.py:am_synthesis; the valid prefix is
        ``LR_length_rounded * hop_total`` samples.
        """
        import jax

        meta = self.meta
        if meta["se_enable"] and se is None:
            raise ValueError("artifact was exported with SE d-vector "
                             "speakers; pass se=")
        ling, emo, spk, lengths = encode_symbol_inputs(
            self.ling_unit, symbol_seq, meta["max_input_len"],
            meta["n_ling"], se=se if meta["se_enable"] else None)

        wav, n_frames = self._call(
            self._am_vars, self._voc_vars, ling, emo, spk, lengths,
            jax.random.PRNGKey(rng_seed))
        n_frames = int(np.asarray(n_frames)[0])
        wav = np.asarray(wav)[0, : n_frames * meta["hop_total"], 0]
        return wav, n_frames
