"""mp3 -> wav dataset converter (reference: convert_to_wav.py).

Rewrites a CommonVoice-style tsv while converting each referenced clip with
ffmpeg. Usage:

    python tools/convert_to_wav.py <src_root> <dst_root> [--tsv train.tsv]
"""
from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys


def convert_file(src: str, dst: str) -> bool:
    try:
        subprocess.run(
            ["ffmpeg", "-y", "-i", src, dst],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"  failed: {src}: {e}", file=sys.stderr)
        return False


def convert_from_tsv(
    src_root: str,
    dst_root: str,
    tsv_name: str = "train.tsv",
    clip_dir: str = "clips",
):
    os.makedirs(os.path.join(dst_root, clip_dir), exist_ok=True)
    src_tsv = os.path.join(src_root, tsv_name)
    dst_tsv = os.path.join(dst_root, tsv_name)
    n_ok = 0
    with open(src_tsv, "r", encoding="utf-8") as fin, open(
        dst_tsv, "w", newline="", encoding="utf-8"
    ) as fout:
        reader = csv.reader(fin, delimiter="\t")
        writer = csv.writer(fout, delimiter="\t")
        header = next(reader)
        writer.writerow(header)
        for row in reader:
            filepath = row[1]
            new_name = os.path.splitext(filepath)[0] + ".wav"
            src = os.path.join(src_root, clip_dir, filepath)
            dst = os.path.join(dst_root, clip_dir, new_name)
            if os.path.exists(src) and convert_file(src, dst):
                row[1] = new_name
                writer.writerow(row)
                n_ok += 1
    print(f"converted {n_ok} clips -> {dst_root}")
    return n_ok


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("src_root")
    parser.add_argument("dst_root")
    parser.add_argument("--tsv", default="train.tsv")
    parser.add_argument("--clip-dir", default="clips")
    args = parser.parse_args()
    convert_from_tsv(args.src_root, args.dst_root, args.tsv, args.clip_dir)
