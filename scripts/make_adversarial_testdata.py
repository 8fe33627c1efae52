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

Usage: python scripts/make_adversarial_testdata.py [out_dir] [--skew]

``--skew`` additionally appends a SKEWED block (r8-verdict stretch
task: the measurement audits are only trustworthy if they stay
calibrated under skew, not just under pathology):

- 150 near-identical docs (one shared 24-token template, one token
  mutated per doc) in source ``skewdup`` — a giant LSH shingle bucket
  + a dense true-duplicate cluster, the worst case for both the
  precision lane's candidate volume and the recall lane's sampled
  truth set;
- 120 docs of ONE repeated token in source ``skewlow`` — per-source
  distinct-token count of exactly 1 (HLL small-range correction's
  hardest case);
- 120 docs of all-globally-unique tokens in source ``skewhigh`` —
  per-source distinct cardinality far above every organic source.
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

_TEMPLATE = (
    "spark window merge table column vector stream value data small "
    "join filter big group hash customer sort order slow line part "
    "fast row agg"
).split()


def skew_rows() -> list[tuple]:
    rows = []
    # dense near-duplicate cluster: template with token i%24 replaced
    for i in range(150):
        toks = list(_TEMPLATE)
        toks[i % len(toks)] = f"mut{i}"
        t = " ".join(toks)
        rows.append((200000 + i, t, "en", "skewdup", len(t)))
    # single-distinct-token source
    for i in range(120):
        t = " ".join(["zzz"] * 12)
        rows.append((210000 + i, t, "en", "skewlow", len(t)))
    # all-unique-token source
    for i in range(120):
        t = " ".join(f"uniq{i}x{j}" for j in range(12))
        rows.append((220000 + i, t, "en", "skewhigh", len(t)))
    return rows


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv[1:]
    out = args[0] if args else "/tmp/advdata"
    os.makedirs(out, exist_ok=True)
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f != "documents.parquet":
            dst = os.path.join(out, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(SRC, f), dst)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE adv AS SELECT * FROM '{SRC}/documents.parquet'")
    rows = ADVERSARIAL_ROWS + (skew_rows() if skew else [])
    con.executemany("INSERT INTO adv VALUES (?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY adv TO '{out}/documents.parquet' (FORMAT PARQUET)")
    print(f"{out}: documents with {len(rows)} adversarial rows"
          f"{' (incl. skew block)' if skew else ''}; "
          f"run: python scripts/check_oracle.py {out}")


if __name__ == "__main__":
    main()
