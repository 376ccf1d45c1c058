"""Build dist/engine.zip for the north-rule ship shape:

    spark-submit --py-files dist/engine.zip jobs/dedup.py \
        --input <parquet|catalog.table> --output <dir> --config scale

The zip contains the `dynaalign_spark` package plus conf/seeds.json (the
frozen seed table the config loads at import time)."""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(ROOT, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for base in ("dynaalign_spark", "conf"):
            for dirpath, _, files in os.walk(os.path.join(ROOT, base)):
                if "__pycache__" in dirpath:
                    continue
                for f in sorted(files):
                    p = os.path.join(dirpath, f)
                    z.write(p, os.path.relpath(p, ROOT))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
