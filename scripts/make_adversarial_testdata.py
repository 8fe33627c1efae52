"""Build an adversarial testdata directory: sf0.001 with the documents
table augmented by pathological rows — NULL text, empty string,
punctuation-only, CJK/accented (token-free under the a-z0-9
tokenizer), multi-space runs, PII-bearing strings.

Running ``scripts/check_oracle.py <out_dir>`` against it verifies that
every oracle's NULL/empty/unicode semantics match the engine BEFORE a
future testdata regeneration surfaces the divergence in the driver
gate.  (This caught: DuckDB ``array_to_string([])`` = NULL vs Spark
``array_join([])`` = '' — zero-token docs used to pair as
"near-duplicates" on the Spark side only — and an MLlib HashingTF
crash on NULL token arrays.)

Usage: python scripts/make_adversarial_testdata.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.001"

ADVERSARIAL_ROWS = [
    (100001, None, "en", "src0", None),
    (100002, "", "en", "src1", 0),
    (100003, "!!! --- ???", "de", "src1", 11),
    (100004, "solo", "fr", "src2", 4),
    (100005, "héllo wörld ünïcode tëxt hërë nöw", "de", "src0", 33),
    (100006, "a  b   c", "en", "src3", 8),
    (100007, "日本語 テキスト です ここ に", "zh", "src2", 15),
    (100008, "x@y.com 12345 call 9999", "en", "src1", 23),
]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/advdata"
    os.makedirs(out, exist_ok=True)
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f != "documents.parquet":
            dst = os.path.join(out, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(SRC, f), dst)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE adv AS SELECT * FROM '{SRC}/documents.parquet'")
    con.executemany("INSERT INTO adv VALUES (?, ?, ?, ?, ?)", ADVERSARIAL_ROWS)
    con.execute(f"COPY adv TO '{out}/documents.parquet' (FORMAT PARQUET)")
    print(f"{out}: documents with {len(ADVERSARIAL_ROWS)} adversarial rows; "
          f"run: python scripts/check_oracle.py {out}")


if __name__ == "__main__":
    main()
