"""Generate a synthetic corpus with speech-like statistics for sustained
training runs (no real speech exists in this environment).

Unlike the 12-utterance sine fixtures used by the parity harnesses, this
corpus gives the trainer realistic load and LEARNABLE structure:

- phone-dependent acoustics: every PinYin phone gets a fixed formant pair
  (voiced) or noise band (unvoiced), so the audio actually realizes the
  symbol sequence — MAS alignment is learnable, not arbitrary;
- log-normal phone durations (initials ~6 frames median, finals ~14,
  clipped [3, 40]) — the distribution real aligners produce;
- declining F0 contours with per-tone shapes (tone1 flat / tone2 rise /
  tone3 dip / tone4 fall), phrase resets, jitter, and per-speaker base
  pitch (F ~210 Hz, M ~125 Hz) — so the pitch predictor sees structure;
- multi-speaker (speaker tag in the symbol stream, per-speaker formant
  scaling), utterance lengths spanning the duration buckets (defaults
  1.5-12 s with a long tail to ~16 s).

Layout matches what AMDataset/VocDataset read (the AudioProcessor's output
contract, reference audio_processor.py:65-776): wav/ mel/ duration/ f0/
energy/ frame_f0/ frame_uv/ raw_metafile.txt f0/f0_{mean,std}.txt
audio_config.yaml. With --prosody frame (default), f0/ and energy/ hold
frame-level targets (the MAS data contract); --prosody phone averages them
over the true durations for duration-supervised configs.

Usage: python tools/gen_corpus.py OUT_DIR [--n 200] [--seed 0]
       [--speakers F7,F1,M2,M9] [--prosody frame|phone]
"""

import argparse
import hashlib
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 16000
HOP = 200
FRAME_S = HOP / SR

# PinYin initials treated as consonants; {m,n,l,r} are voiced consonants
_INITIALS = ["b", "c", "ch", "d", "f", "g", "h", "j", "k", "l", "m", "n",
             "p", "q", "r", "s", "sh", "t", "x", "z", "zh"]
_VOICED_INITIALS = {"m", "n", "l", "r"}


def _phone_acoustics(phone):
    """Deterministic per-phone acoustic identity from a hash of its name:
    (voiced, F1, F2, noise_centroid). Stable across corpora/runs."""
    h = int(hashlib.md5(phone.encode()).hexdigest()[:8], 16)
    base = phone[:-2] if phone.endswith("_c") else phone
    is_initial = base in _INITIALS
    voiced = (not is_initial) or (base in _VOICED_INITIALS)
    f1 = 300.0 + (h % 1000) * 0.6            # 300-900 Hz
    f2 = 900.0 + ((h >> 10) % 1000) * 1.6    # 900-2500 Hz
    noise_c = 2000.0 + ((h >> 20) % 1000) * 4.0  # 2-6 kHz
    return voiced, f1, f2, noise_c


_TONE_SHAPE = {
    "tone1": lambda x: np.zeros_like(x),
    "tone2": lambda x: 0.12 * (x - 0.5),          # rise
    "tone3": lambda x: -0.12 * np.sin(np.pi * x),  # low dip
    "tone4": lambda x: -0.18 * (x - 0.5),          # fall
    "tone5": lambda x: -0.04 * x,                  # neutral, slight fall
}


def _sample_utterance(rng, phones_voc, speaker, min_s, max_s):
    """Symbol sequence + per-phone (duration_frames, tone, voiced...)."""
    finals = [p for p in phones_voc
              if p[:-2] not in _INITIALS and not p.startswith("#")]
    initials = [p for p in phones_voc if p[:-2] in _INITIALS]
    target_s = float(np.exp(rng.uniform(np.log(min_s), np.log(max_s))))
    toks, durs, tones_out, f0off = [], [], [], []
    t_acc = 0.0
    word_len = 0
    word_pos = 0
    while t_acc < target_s:
        if word_pos == 0:
            word_len = rng.randint(1, 4)  # 1-3 syllables per word
        tone = f"tone{rng.randint(1, 6)}"
        syl = [(rng.choice(initials), "s_begin"), (rng.choice(finals), "s_end")]
        for k, (ph, sflag) in enumerate(syl):
            if word_len == 1:
                ws = "word_both"
            elif word_pos == 0:
                ws = "word_begin"
            elif word_pos == word_len - 1:
                ws = "word_end"
            else:
                ws = "word_middle"
            base = ph[:-2]
            is_initial = base in _INITIALS
            med = 6.0 if is_initial else 14.0
            d = int(np.clip(np.round(np.exp(
                np.log(med) + 0.40 * rng.randn())), 3, 40))
            toks.append(f"{{{ph}${tone}${sflag}${ws}$emotion_neutral${speaker}}}")
            durs.append(d)
            tones_out.append(tone)
            t_acc += d * FRAME_S
        word_pos += 1
        if word_pos >= word_len:
            word_pos = 0
    return toks, np.asarray(durs, dtype=np.int64), tones_out


def _synth(rng, phones, durs, tones, base_f0, formant_scale):
    """Per-frame f0/uv/amp tracks + waveform realizing the phone string."""
    n_frames = int(durs.sum())
    frame_f0 = np.zeros(n_frames, dtype=np.float64)
    frame_uv = np.zeros(n_frames, dtype=np.float64)
    amp = np.zeros(n_frames, dtype=np.float64)
    acoustics, pos = [], 0
    # utterance declination with phrase resets every ~10 phones-worth of time
    t_frames = np.arange(n_frames) / max(n_frames, 1)
    decl = 1.15 - 0.30 * t_frames
    phrase = 0.05 * np.cos(2 * np.pi * t_frames * max(1, n_frames // 400))
    for ph_tok, d, tone in zip(phones, durs, tones):
        ph = ph_tok[1:].split("$")[0]
        voiced, f1, f2, noise_c = _phone_acoustics(ph)
        x = np.arange(d) / max(d, 1)
        shape = _TONE_SHAPE.get(tone, _TONE_SHAPE["tone1"])(x)
        seg_f0 = base_f0 * (decl[pos:pos + d] + phrase[pos:pos + d]) \
            * np.exp(shape) * np.exp(0.02 * rng.randn(d))
        if voiced:
            frame_f0[pos:pos + d] = seg_f0
            frame_uv[pos:pos + d] = 1.0
            amp[pos:pos + d] = (0.5 + 0.2 * rng.rand()) * (1.0 - 0.3 * t_frames[pos:pos + d])
        else:
            amp[pos:pos + d] = (0.15 + 0.1 * rng.rand())
        acoustics.append((pos, d, voiced, f1 * formant_scale,
                          f2 * formant_scale, noise_c))
        pos += d

    n_samp = n_frames * HOP
    # sample-rate tracks (piecewise-constant per frame is fine at 12.5 ms)
    f0_s = np.repeat(frame_f0, HOP)
    uv_s = np.repeat(frame_uv, HOP)
    amp_s = np.repeat(amp, HOP)
    # smooth amp to avoid frame-edge clicks (5 ms boxcar)
    k = SR // 200
    amp_s = np.convolve(amp_s, np.ones(k) / k, mode="same")
    phase = np.cumsum(2 * np.pi * f0_s / SR)
    wav = np.zeros(n_samp)
    # voiced: harmonics weighted by the phone's formant envelope
    for pos, d, voiced, f1, f2, _ in acoustics:
        s0, s1 = pos * HOP, (pos + d) * HOP
        if not voiced:
            continue
        seg_phase = phase[s0:s1]
        seg_f0 = np.maximum(f0_s[s0:s1], 1.0)
        seg = np.zeros(s1 - s0)
        for h in range(1, 11):
            fh = h * seg_f0
            w = (np.exp(-0.5 * ((fh - f1) / 120.0) ** 2)
                 + 0.7 * np.exp(-0.5 * ((fh - f2) / 180.0) ** 2)
                 + 0.15 / h)
            seg += w * np.sin(h * seg_phase)
        wav[s0:s1] += seg
    # unvoiced: band-shaped noise via FFT masking per segment
    for pos, d, voiced, _, _, noise_c in acoustics:
        if voiced:
            continue
        s0, s1 = pos * HOP, (pos + d) * HOP
        n = s1 - s0
        noise = rng.randn(n)
        spec = np.fft.rfft(noise)
        freqs = np.fft.rfftfreq(n, 1.0 / SR)
        mask = np.exp(-0.5 * ((freqs - noise_c) / (0.35 * noise_c)) ** 2)
        wav[s0:s1] += np.fft.irfft(spec * mask, n) * 3.0
    wav = wav * amp_s + 0.003 * rng.randn(n_samp)
    peak = np.abs(wav).max()
    if peak > 0:
        wav = 0.85 * wav / peak
    return wav.astype(np.float32), frame_f0, frame_uv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--speakers", default="F7,F1,M2,M9")
    ap.add_argument("--prosody", choices=["frame", "phone"], default="frame")
    ap.add_argument("--min-s", type=float, default=1.5)
    ap.add_argument("--max-s", type=float, default=12.0)
    ap.add_argument("--long-tail", type=float, default=0.05,
                    help="fraction of utterances drawn up to 16 s")
    args = ap.parse_args()

    from kantts_tpu.dsp.mel import MelSpectrogramExtractor
    from kantts_tpu.text.lang_symbols import get_language_symbols
    from kantts_tpu.utils.audio import save_wav

    phones_voc, _, _, _ = get_language_symbols("PinYin")
    speakers = args.speakers.split(",")
    spk_base = {s: (np.random.RandomState(hash(s) % 2 ** 31).uniform(195, 230)
                    if s.startswith("F")
                    else np.random.RandomState(hash(s) % 2 ** 31).uniform(110, 140))
                for s in speakers}
    spk_scale = {s: (1.0 if s.startswith("F") else 0.88) for s in speakers}

    root = args.out_dir
    for sub in ["wav", "mel", "duration", "f0", "energy", "frame_f0",
                "frame_uv"]:
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    extractor = MelSpectrogramExtractor(SR, n_fft=2048, hop_length=HOP,
                                        win_length=1000, n_mels=80,
                                        fmin=0.0, fmax=8000.0)
    N_FFT = 2048

    def extract_mel(wav):
        """Bucket the wav length so the jitted extractor compiles ~15 programs
        instead of one per utterance (a full XLA compile per distinct shape).
        Reflect-padding the tail by >= n_fft before the call reproduces the
        extractor's own center reflect-padding exactly, so the sliced result
        is bit-identical to the unbucketed call."""
        n = len(wav)
        bucket = int(np.ceil((n + N_FFT) / SR) * SR)
        padded = np.pad(wav, (0, bucket - n), mode="reflect")
        return extractor(padded)[: n // HOP + 1]
    rng = np.random.RandomState(args.seed)
    lines = []
    all_f0 = []
    stash = []
    for i in range(args.n):
        spk = speakers[i % len(speakers)]
        max_s = 16.0 if rng.rand() < args.long_tail else args.max_s
        toks, durs, tones = _sample_utterance(rng, phones_voc, spk,
                                              args.min_s, max_s)
        wav, f0_hz, uv = _synth(rng, toks, durs, tones, spk_base[spk],
                                spk_scale[spk])
        utt = f"utt{i:04d}"
        mel = extract_mel(wav)
        n_frames = min(mel.shape[0], len(f0_hz))
        mel, f0_hz, uv = mel[:n_frames], f0_hz[:n_frames], uv[:n_frames]
        durs = durs.copy()
        drop = int(durs.sum()) - n_frames
        durs[-1] -= drop  # STFT edge truncation lands on the last phone
        assert durs[-1] > 0
        rms = np.sqrt(
            np.convolve(wav ** 2, np.ones(HOP) / HOP, "same")[::HOP][:n_frames])
        stash.append((utt, toks, durs, mel, f0_hz, uv, rms, wav))
        all_f0.append(f0_hz[uv > 0])
        lines.append(f"{utt}\t{' '.join(toks)}")
        if (i + 1) % 50 == 0:
            print(f"synthesized {i + 1}/{args.n}", flush=True)

    f0_cat = np.concatenate(all_f0)
    f0_mean, f0_std = float(f0_cat.mean()), float(f0_cat.std() + 1e-9)
    rms_cat = np.concatenate([s[6] for s in stash])
    e_mean, e_std = float(rms_cat.mean()), float(rms_cat.std() + 1e-9)

    for utt, toks, durs, mel, f0_hz, uv, rms, wav in stash:
        f0_norm = np.where(uv > 0, (f0_hz - f0_mean) / f0_std, 0.0).astype(np.float32)
        e_norm = ((rms - e_mean) / e_std).astype(np.float32)
        if args.prosody == "phone":
            idx = np.repeat(np.arange(len(durs)), durs)
            f0_t = np.zeros(len(durs), dtype=np.float32)
            e_t = np.zeros(len(durs), dtype=np.float32)
            for j in range(len(durs)):
                m = idx == j
                f0_t[j] = f0_norm[m].mean()
                e_t[j] = e_norm[m].mean()
        else:
            f0_t, e_t = f0_norm, e_norm
        j = os.path.join
        save_wav(wav, j(root, "wav", f"{utt}.wav"), SR)
        np.save(j(root, "mel", f"{utt}.npy"), mel)
        np.save(j(root, "duration", f"{utt}.npy"), durs)
        np.save(j(root, "f0", f"{utt}.npy"), f0_t)
        np.save(j(root, "energy", f"{utt}.npy"), e_t)
        np.save(j(root, "frame_f0", f"{utt}.npy"), f0_norm)
        np.save(j(root, "frame_uv", f"{utt}.npy"), uv.astype(np.float32))

    with open(os.path.join(root, "raw_metafile.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    np.savetxt(os.path.join(root, "f0", "f0_mean.txt"), [f0_mean])
    np.savetxt(os.path.join(root, "f0", "f0_std.txt"), [f0_std])
    import yaml

    with open(os.path.join(root, "audio_config.yaml"), "w") as f:
        yaml.safe_dump({"audio_config": {
            "sampling_rate": SR, "hop_length": HOP, "win_length": 1000,
            "n_fft": 2048, "n_mels": 80, "fmin": 0.0, "fmax": 8000.0,
            "norm_type": "mean_std", "max_norm": 1.0, "symmetric": False,
            "min_level_db": -100.0, "ref_level_db": 20,
        }}, f)

    secs = sum(len(s[7]) for s in stash) / SR
    frames = sum(s[3].shape[0] for s in stash)
    print(f"wrote {args.n} utts, {secs / 60:.1f} min audio, {frames} frames, "
          f"f0 mean/std {f0_mean:.1f}/{f0_std:.1f} Hz -> {root}")


if __name__ == "__main__":
    main()
