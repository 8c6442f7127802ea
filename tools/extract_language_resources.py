"""Extract per-language phoneset/posset/tone/syllable-map resources from the
reference KAN-TTS tree into kantts_tpu's compact JSON resource format.

The reference ships these as XML/txt data files
(/root/reference/kantts/preprocess/languages/<lang>/{PhoneSet.xml,PosSet.xml,
tonelist.txt,py2phoneMap.txt,En2ChPhoneMap.txt}). The *content* must match for
symbol-table parity (vocab ids feed embedding dims); the *format* here is our
own JSON schema. Run once; the JSON is committed under
kantts_tpu/resources/languages/.

Usage: python tools/extract_language_resources.py [reference_languages_dir]
"""

import json
import os
import sys
import xml.etree.ElementTree as ET

NS = "{http://schemas.alibaba-inc.com/tts}"
LANGS = ["PinYin", "ZhHK", "WuuShanghai", "Sichuan"]

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "kantts_tpu", "resources", "languages",
)


def parse_phoneset(path):
    phones = []
    root = ET.parse(path).getroot()
    for node in root.findall(NS + "phone"):
        entry = {"name": node.find(NS + "name").text}
        for field in ("id", "cv", "if", "uv", "ap", "am"):
            sub = node.find(NS + field)
            if sub is not None and sub.text is not None:
                entry[field] = sub.text
        phones.append(entry)
    return phones


def parse_posset(path):
    poses = []
    root = ET.parse(path).getroot()
    for node in root.findall(NS + "pos"):
        entry = {}
        for field in ("id", "name"):
            sub = node.find(NS + field)
            if sub is not None and sub.text is not None:
                entry[field] = sub.text
        poses.append(entry)
    return poses


def parse_tonelist(path):
    with open(path, "r", encoding="utf-8") as f:
        return [line.strip() for line in f.readlines()]


def parse_map(path):
    """Parse `key\tv1 v2 ...` (py2phoneMap) or `key\tvalue` (En2ChPhoneMap) files."""
    mapping = {}
    if not os.path.exists(path):
        return mapping
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split("\t")
            if len(parts) == 1:
                parts = line.split(None, 1)
            if len(parts) < 2:
                continue
            key, value = parts[0].strip(), parts[1].strip()
            mapping[key] = value.split()
    return mapping


def main():
    src_root = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/kantts/preprocess/languages"
    os.makedirs(OUT_DIR, exist_ok=True)
    for lang in LANGS:
        lang_dir = os.path.join(src_root, lang)
        if not os.path.isdir(lang_dir):
            print(f"skip {lang}: not found")
            continue
        resource = {
            "language": lang,
            "phones": parse_phoneset(os.path.join(lang_dir, "PhoneSet.xml")),
            "poses": parse_posset(os.path.join(lang_dir, "PosSet.xml")),
            "tones": parse_tonelist(os.path.join(lang_dir, "tonelist.txt")),
            "sy2ph": parse_map(os.path.join(lang_dir, "py2phoneMap.txt")),
            "f2t": parse_map(os.path.join(lang_dir, "En2ChPhoneMap.txt")),
        }
        out_path = os.path.join(OUT_DIR, f"{lang}.json")
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(resource, f, ensure_ascii=False, indent=1)
        print(f"wrote {out_path}: {len(resource['phones'])} phones, "
              f"{len(resource['tones'])} tones, {len(resource['sy2ph'])} syllable maps")


if __name__ == "__main__":
    main()
