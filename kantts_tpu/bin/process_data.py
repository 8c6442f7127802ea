"""Offline dataset preprocessing: raw voice dir -> training features + metafiles.

CLI parity: /root/reference/kantts/preprocess/data_process.py:96-211 — text
front-end (or byte mode), FP augmentation, audio feature pipeline, optional
speaker-embedding extraction, then Voc/AM train/valid metafile generation
(with fpadd/fprm variants).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from kantts_tpu.data.dataset import AMDataset, VocDataset
from kantts_tpu.preprocess.audio_processor import AudioProcessor
from kantts_tpu.preprocess.fp_processor import FpProcessor, is_fp_line
from kantts_tpu.preprocess.script_convertor import TextScriptConvertor
from kantts_tpu.utils.config import load_yaml, stamp_config, dump_yaml
from kantts_tpu.utils.log import logging_to_file

logging.basicConfig(
    format="%(asctime)s, %(levelname)-4s [%(filename)s:%(lineno)d] %(message)s",
    datefmt="%Y-%m-%d:%H:%M:%S",
    level=logging.INFO,
)


def gen_metafile(voice_output_dir: str, fp_enable: bool = False, badlist=None,
                 split_ratio: float = 0.98) -> None:
    """Voc + AM train/valid splits (reference data_process.py:34-92)."""
    voc_train = os.path.join(voice_output_dir, "train.lst")
    voc_valid = os.path.join(voice_output_dir, "valid.lst")
    if not (os.path.exists(voc_train) and os.path.exists(voc_valid)):
        VocDataset.gen_metafile(os.path.join(voice_output_dir, "wav"),
                                voice_output_dir, split_ratio)
        logging.info("Voc metafile generated.")

    raw_metafile = os.path.join(voice_output_dir, "raw_metafile.txt")
    am_train = os.path.join(voice_output_dir, "am_train.lst")
    am_valid = os.path.join(voice_output_dir, "am_valid.lst")
    if not (os.path.exists(am_train) and os.path.exists(am_valid)):
        AMDataset.gen_metafile(raw_metafile, voice_output_dir, am_train,
                               am_valid, badlist, split_ratio)
        logging.info("AM metafile generated.")

    if fp_enable:
        for variant in ("fpadd", "fprm"):
            meta = os.path.join(voice_output_dir, f"{variant}_metafile.txt")
            train = os.path.join(voice_output_dir, f"am_{variant}_train.lst")
            valid = os.path.join(voice_output_dir, f"am_{variant}_valid.lst")
            if not (os.path.exists(train) and os.path.exists(valid)):
                AMDataset.gen_metafile(meta, voice_output_dir, train, valid,
                                       badlist, split_ratio)
                logging.info("AM %s metafile generated.", variant)


def process_data(voice_input_dir: str, voice_output_dir: str,
                 audio_config: str, speaker_name: str | None = None,
                 target_lang: str = "PinYin", skip_script: bool = False,
                 se_model: str | None = None) -> None:
    foreign_lang = "EnUS"
    os.makedirs(voice_output_dir, exist_ok=True)

    emo_tag_path = os.path.join(voice_input_dir, "emotion_tag.txt")
    if not os.path.exists(emo_tag_path):
        emo_tag_path = None

    plain_text_dir = os.path.join(voice_input_dir, "text")
    if speaker_name is None:
        speaker_name = os.path.basename(os.path.normpath(voice_input_dir))

    config = stamp_config(load_yaml(audio_config))
    se_enable = config["audio_config"].get("se_feature", False)
    dump_yaml(config, os.path.join(voice_output_dir, "audio_config.yaml"))

    fp_enable = False
    raw_metafile = None
    prosody = None
    if skip_script:
        logging.info("Skip script conversion")
    else:
        raw_metafile = os.path.join(voice_output_dir, "raw_metafile.txt")
        if os.path.exists(plain_text_dir):
            TextScriptConvertor.turn_text_into_bytes(
                os.path.join(plain_text_dir, "text.txt"), raw_metafile,
                speaker_name,
            )
        else:
            tsc = TextScriptConvertor(target_lang, foreign_lang, emo_tag_path,
                                      speaker_name)
            prosody = os.path.join(voice_input_dir, "prosody", "prosody.txt")
            tsc.process(
                prosody,
                os.path.join(voice_output_dir, "Script.xml"),
                raw_metafile,
            )
            with open(prosody, encoding="utf-8") as f:
                lines = f.readlines()
            fp_enable = len(lines) > 1 and is_fp_line(lines[1])

    if fp_enable:
        FpProcessor().process(voice_output_dir, prosody, raw_metafile)
        logging.info("Processing fp done.")

    ap = AudioProcessor(config["audio_config"])
    ap.process(voice_input_dir, voice_output_dir, raw_metafile)
    logging.info("Processing audio done.")

    if se_enable:
        from kantts_tpu.preprocess.se_processor import SpeakerEmbeddingProcessor

        SpeakerEmbeddingProcessor().process(voice_output_dir, se_model)
        logging.info("Processing speaker embedding done.")

    gen_metafile(voice_output_dir, fp_enable, ap.badcase_list)
    logging.info("Processing done.")


def main():
    parser = argparse.ArgumentParser(description="Dataset preprocessor")
    parser.add_argument("--voice_input_dir", type=str, required=True)
    parser.add_argument("--voice_output_dir", type=str, required=True)
    parser.add_argument("--audio_config", type=str, required=True)
    parser.add_argument("--speaker", type=str, default=None)
    parser.add_argument("--lang", type=str, default="PinYin")
    parser.add_argument("--se_model", type=str, default=None)
    parser.add_argument("--skip_script", action="store_true")
    args = parser.parse_args()

    os.makedirs(args.voice_output_dir, exist_ok=True)
    logging_to_file(os.path.join(args.voice_output_dir,
                                 "data_process_stdout.log"))
    process_data(args.voice_input_dir, args.voice_output_dir,
                 args.audio_config, args.speaker, args.lang,
                 args.skip_script, args.se_model)


if __name__ == "__main__":
    main()
