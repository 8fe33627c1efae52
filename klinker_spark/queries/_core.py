"""Query registry — every SURVEY §2 operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable with (where SQL-expressible) a
DuckDB oracle producing the identical result on the same parquet.

Mapping of the blocking kernel onto the synthetic star schema
(FIXTURES.md "Driver synthetic tables"): ``customer`` is the left
entity table, ``supplier`` the right; ``orders``/``lineitem`` FK edges
play the relation-triple role; deterministic arithmetic relations
(``c_custkey = 10*s_suppkey``) stand in for gold links.

Determinism rules that make Spark ⇄ DuckDB value-hashes match:
- ids cast to string on both sides; money as integer cents
  (``round(x*100)::bigint``) — no float-sum order sensitivity;
- every double output rounded to 6 decimals;
- array cells avoided in oracle-checked outputs — blocks are exploded
  to scalar rows (the at-scale-primary ``pairs`` view anyway);
- timestamps compared as epoch millis (Spark stores µs, DuckDB ns);
- all window orderings carry a total tie-break.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..blockers.lsh import MinHashLSHBlocker
from ..blockers.standard import StandardBlocker
from ..blockers.token import TokenBlocker
from ..blockers.unique_name import UniqueNameBlocker
from ..data.blocks import BlockManager
from ..data.frames import EntityFrame, clean_rdf_datatype, melt
from ..data.io import load_events
from ..functions.text import STOPWORDS, qgrams, tokenize
from ..session import local_df
from ..ops.dedup import exact_dedup, minhash_lsh_dedup, ngram_jaccard_dedup, simhash_dedup
from ..ops.similarity import ann_topk_ivf, brute_force_topk
from ..ops.textstats import (
    doc_fingerprint,
    langid_by_profile,
    quality_score,
    tfidf_top_tokens,
    token_count,
    token_frequencies,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)


def _toks_cte(extra: str = "") -> str:
    """DuckDB CTE: documents → per-doc token array, mirroring
    ``tokenize(text, min_token_length=1, stopwords=[])``.  ``extra``
    carries additional columns (e.g. ``", source"``).  Single source of
    truth for the tokenize SQL — a semantics change edited here reaches
    every dedup/curation oracle at once."""
    return f"""
    toks AS (
      SELECT doc_id{extra},
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> length(t) >= 1) tk
      FROM documents)"""


def _shingle_cte(extra: str = "", k: int = 3) -> str:
    """DuckDB CTE chain toks→sh→ds: documents → DISTINCT per-doc k-gram
    shingles, mirroring ``word_shingles(tokenize(...), k)`` (docs of ≤k
    tokens yield one whole-doc shingle)."""
    return (
        _toks_cte(extra)
        + f""",
    sh AS (
      SELECT doc_id{extra},
             CASE WHEN tk IS NULL OR len(tk) = 0 THEN CAST([] AS VARCHAR[])
                  WHEN len(tk) <= {k} THEN [array_to_string(tk, ' ')]
                  ELSE list_transform(generate_series(1, len(tk) - {k - 1}),
                                      i -> array_to_string(tk[i:i+{k - 1}], ' '))
             END sg
      FROM toks),
    ds AS (SELECT DISTINCT doc_id{extra}, shingle
           FROM (SELECT doc_id{extra}, unnest(sg) shingle FROM sh))"""
    )


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cust_frame(spark, sf_dir) -> EntityFrame:
    return EntityFrame.from_wide(
        _t(spark, sf_dir, "customer"), "customer", "c_custkey", ["c_name"]
    )


def _supp_frame(spark, sf_dir) -> EntityFrame:
    return EntityFrame.from_wide(
        _t(spark, sf_dir, "supplier"), "supplier", "s_suppkey", ["s_name"]
    )


def _explode_blocks(bm: BlockManager) -> DataFrame:
    """Blocks → scalar rows (block_key, left_id, right_id) — the
    key-frame join when available (no array cells), else explode²."""
    return bm.block_pairs()


