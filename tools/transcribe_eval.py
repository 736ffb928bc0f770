#!/usr/bin/env python3
"""Transcribe the reference's public eval artifact into a repo resource.

Reads /root/reference/data/testset_micro.parquet.gzip (30 rows of
formation_name / paper_id / paragraph — the reference's own micro eval
set, sampled from formation_sample.parquet.gzip in
notebooks/devs/location_and_geo_entities.ipynb) and writes it as JSON
lines with ASCII-escaped strings, preserving row order and every byte of
the paragraphs. Driver-side tool only (pandas/pyarrow are not available
to the shipped Scala code); the output file is checked in, so this is a
one-time transcription, rerun only if the reference artifact changes.
"""
import json
import sys

import pandas as pd

SRC = "/root/reference/data/testset_micro.parquet.gzip"
DST = "src/main/resources/eval/testset_micro.jsonl"

def main():
    df = pd.read_parquet(SRC)
    with open(DST, "w", encoding="ascii") as f:
        for _, r in df.iterrows():
            f.write(json.dumps(
                {"formation_name": r["formation_name"],
                 "paper_id": r["paper_id"],
                 "paragraph": r["paragraph"]},
                ensure_ascii=True, sort_keys=True) + "\n")
    print(f"wrote {len(df)} rows to {DST}")

if __name__ == "__main__":
    sys.exit(main())
