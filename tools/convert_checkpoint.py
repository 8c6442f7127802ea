"""Convert a reference KAN-TTS torch checkpoint (.pth) into a kantts_tpu
msgpack checkpoint, so reference-trained models run on TPU unchanged.

Usage:
  python tools/convert_checkpoint.py --model_type sambert \\
      --torch_ckpt ckpt.pth --config config.yaml --out checkpoint.ckpt
  python tools/convert_checkpoint.py --model_type hifigan ...

The torch checkpoint layouts are the reference trainer's
({model: ...} for SAM-BERT, {model: {generator: ..., discriminator: ...}}
for HiFi-GAN; reference trainer.py:1007-1021 and :591-632).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from flax import serialization

from kantts_tpu.utils.config import load_yaml
from kantts_tpu.utils.torch_convert import convert_hifigan_generator, convert_sambert


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_type", choices=["sambert", "hifigan"],
                        required=True)
    parser.add_argument("--torch_ckpt", type=str, required=True)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--out", type=str, required=True)
    args = parser.parse_args()

    import torch

    payload = torch.load(args.torch_ckpt, map_location="cpu")
    config = load_yaml(args.config)

    if args.model_type == "sambert":
        cfg = config["Model"]["KanTtsSAMBERT"]["params"]
        # vocab sizes may be absent from the dumped config; infer from weights
        sd = {k: v.numpy() for k, v in payload["model"].items()}
        cfg.setdefault("sy", sd.get("text_encoder.sy_emb.weight",
                                    np.zeros((0,))).shape[0])
        cfg.setdefault("tone", sd.get("text_encoder.tone_emb.weight",
                                      np.zeros((0,))).shape[0])
        cfg.setdefault("syllable_flag",
                       sd.get("text_encoder.syllable_flag_emb.weight",
                              np.zeros((0,))).shape[0])
        cfg.setdefault("word_segment", sd.get("text_encoder.ws_emb.weight",
                                              np.zeros((0,))).shape[0])
        cfg.setdefault("emotion", sd.get("emo_tokenizer.weight",
                                         np.zeros((0,))).shape[0])
        if "spk_tokenizer.weight" in sd:
            cfg.setdefault("speaker", sd["spk_tokenizer.weight"].shape[0])
        tree = {"model": convert_sambert(sd, cfg),
                "steps": int(payload.get("steps", 0))}
    else:
        gen_cfg = config["Model"]["Generator"]["params"]
        sd = {k: v.numpy() for k, v in payload["model"]["generator"].items()}
        tree = {
            "model": {"generator": convert_hifigan_generator(sd, gen_cfg),
                      "discriminator": {}},
            "steps": int(payload.get("steps", 0)),
        }

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(tree))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
