"""Sharded cuckoo URL-seen prefilter (north_rule: "bloom/cuckoo URL-
seen filter ... vectorized pandas/Arrow UDF over murmur3-hashed
URLs") — the deletion-capable alternative to bloomfilter.py with the
SAME distributed interface (empty_bits_df / mark / probe, plus
delete): per-shard state rows cogrouped with candidates via
applyInPandas, so no executor holds the whole filter and no driver
collect happens. Shard id comes from the murmur3 value
(bloomfilter.with_shard_cols), bits persist to the SnapshotStore.

Why a cuckoo filter at all: a bloom filter cannot delete — a re-crawl
that expires URLs from the seen-set would have to rebuild the bits
from scratch, while a cuckoo filter removes the fingerprint in place
(delete()). Lookup is two bucket reads instead of k bit probes.

Layout per shard: ``1 overflow byte + n_buckets × SLOTS uint16
fingerprints`` (0 = empty slot). n_buckets is a power of two so the
partner-bucket relation i2 = i1 XOR H(fp) is an involution (the
standard Fan et al. partial-key cuckoo trick). An insert that still
has no home after MAX_KICKS evictions sets the shard's overflow
byte; an overflowed shard answers _maybe_seen=True for everything —
degraded to "no prefilter" but NEVER a false negative, so the
exactness contract (prefilter only skips the anti-join for
definitely-new URLs; SURVEY.md §7.4.1) holds at any fill level.

Probe/fingerprint math is vectorized numpy over the JVM-computed
hash columns. Inserts run a vectorized bulk phase (one numpy pass
per slot column places every key whose bucket 1 has room); only keys
whose primary bucket is full — the minority at the target ≤80% fill —
walk the per-key cuckoo eviction chain."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .bloomfilter import BITS_SCHEMA, with_shard_cols

__all__ = ["CuckooConfig", "empty_bits_df", "mark", "probe", "delete",
           "overflowed_shards"]

SLOTS = 4
MAX_KICKS = 500
_FP_MIX = np.uint64(0x9E3779B97F4A7C15)


class CuckooConfig:
    def __init__(self, n_shards: int = 32, buckets_per_shard: int = 1 << 15):
        if buckets_per_shard & (buckets_per_shard - 1):
            raise ValueError("buckets_per_shard must be a power of two "
                             "(partner bucket = i1 XOR H(fp) needs it)")
        self.n_shards = n_shards
        self.buckets_per_shard = buckets_per_shard

    # adapter so engine code can treat Bloom/Cuckoo configs uniformly
    @property
    def state_bytes(self) -> int:
        return 1 + self.buckets_per_shard * SLOTS * 2


def empty_bits_df(spark, cfg: CuckooConfig) -> DataFrame:
    rows = [(s, bytes(cfg.state_bytes)) for s in range(cfg.n_shards)]
    return spark.createDataFrame(rows, BITS_SCHEMA)


def overflowed_shards(bits_df: DataFrame) -> int:
    """Count shards whose overflow byte is set — a degraded shard
    answers maybe-seen for everything (correct, but the prefilter
    stops saving anti-join work there). The engine logs this per wave
    so the degradation is observable (ADVICE r03). Pure column
    expression over `n_shards` rows: the overflow flag is byte 0 of
    the state blob."""
    from pyspark.sql import functions as F

    row = bits_df.select(
        F.sum(
            (F.substring(F.col("bits"), 1, 1) == F.lit(bytes([1]))).cast("int")
        ).alias("n")
    ).first()
    return int(row["n"] or 0)


def _fp_and_buckets(h64: np.ndarray, n_buckets: int):
    """(fingerprint uint16 nonzero, bucket1, bucket2) per key —
    vectorized. Partner bucket via xor of the mixed fingerprint."""
    h = h64.astype(np.uint64)
    fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)  # 0 marks an empty slot
    i1 = (h % np.uint64(n_buckets)).astype(np.int64)
    mixed = (fp.astype(np.uint64) * _FP_MIX) >> np.uint64(32)
    i2 = (i1 ^ mixed.astype(np.int64)) & (n_buckets - 1)
    return fp, i1, i2


def _load(blob: bytes, n_buckets: int):
    arr = np.frombuffer(blob, dtype=np.uint8)
    overflow = bool(arr[0])
    table = arr[1:].view(np.uint16).reshape(n_buckets, SLOTS).copy()
    return overflow, table


def _dump(overflow: bool, table: np.ndarray) -> bytes:
    return bytes([1 if overflow else 0]) + table.tobytes()


def probe(candidates: DataFrame, bits_df: DataFrame, url_col: str, cfg: CuckooConfig) -> DataFrame:
    """Adds boolean ``_maybe_seen`` (same contract as bloomfilter:
    False is definitive, True needs the exact anti-join)."""
    from .shipping import ensure_shipped_df

    ensure_shipped_df(candidates)  # _probe refs module helpers; see shipping.py
    cand = with_shard_cols(candidates, url_col, cfg)
    out_schema = T.StructType(
        cand.schema.fields + [T.StructField("_maybe_seen", T.BooleanType())]
    )
    n_buckets = cfg.buckets_per_shard

    def _probe(cdf: pd.DataFrame, bdf: pd.DataFrame) -> pd.DataFrame:
        if cdf.empty:
            return cdf.assign(_maybe_seen=pd.Series(dtype=bool))
        if bdf.empty:
            return cdf.assign(_maybe_seen=False)
        overflow, table = _load(bdf["bits"].iloc[0], n_buckets)
        if overflow:
            return cdf.assign(_maybe_seen=True)
        fp, i1, i2 = _fp_and_buckets(cdf["_h64"].to_numpy(), n_buckets)
        hit = (table[i1] == fp[:, None]).any(axis=1) | (
            table[i2] == fp[:, None]
        ).any(axis=1)
        return cdf.assign(_maybe_seen=hit)

    return (
        cand.groupBy("_shard")
        .cogroup(bits_df.groupBy("shard"))
        .applyInPandas(_probe, out_schema)
    )


def mark(new_urls: DataFrame, bits_df: DataFrame, url_col: str, cfg: CuckooConfig) -> DataFrame:
    """Returns the updated state table after inserting every url."""
    from .shipping import ensure_shipped_df

    ensure_shipped_df(new_urls)  # _mark refs module helpers; see shipping.py
    urls = with_shard_cols(new_urls.select(url_col), url_col, cfg)
    n_buckets = cfg.buckets_per_shard

    def _mark(udf_: pd.DataFrame, bdf: pd.DataFrame) -> pd.DataFrame:
        if bdf.empty:
            if udf_.empty:
                return pd.DataFrame({"shard": [], "bits": []}).astype({"shard": "int32"})
            shard = int(udf_["_shard"].iloc[0])
            overflow, table = False, np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        else:
            shard = int(bdf["shard"].iloc[0])
            overflow, table = _load(bdf["bits"].iloc[0], n_buckets)
        if not udf_.empty and not overflow:
            fp, i1, _ = _fp_and_buckets(udf_["_h64"].to_numpy(), n_buckets)
            # bulk phase: place keys straight into bucket-1 free slots
            # with vectorized numpy — one pass per slot column, first
            # unplaced key per bucket wins the round. Only keys whose
            # bucket 1 is full (or lost an in-batch bucket race) fall
            # to the per-key cuckoo insert below.
            unplaced = np.arange(len(fp))
            for s in range(SLOTS):
                if not len(unplaced):
                    break
                i1u = i1[unplaced]
                _, first_idx = np.unique(i1u, return_index=True)
                winner = np.zeros(len(unplaced), dtype=bool)
                winner[first_idx] = True
                take = winner & (table[i1u, s] == 0)
                table[i1u[take], s] = fp[unplaced[take]]
                unplaced = unplaced[~take]
            for k in unplaced:
                overflow = not _insert_one(table, int(fp[k]), int(i1[k]), n_buckets)
                if overflow:
                    break
        return pd.DataFrame({"shard": [shard], "bits": [_dump(overflow, table)]})

    return (
        urls.groupBy("_shard")
        .cogroup(bits_df.groupBy("shard"))
        .applyInPandas(_mark, BITS_SCHEMA)
    )


def _partner(i: int, f: int, n_buckets: int) -> int:
    # plain-int math: a numpy SCALAR multiply would raise
    # RuntimeWarning on the (expected, harmless) 64-bit wraparound,
    # which warnings-as-errors harnesses promote to task failures;
    # the value is identical to _fp_and_buckets' wrapping array math
    mixed = ((f * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF) >> 32
    return (i ^ mixed) & (n_buckets - 1)


def _insert_one(table: np.ndarray, f: int, i1: int, n_buckets: int) -> bool:
    """Standard cuckoo insert with DETERMINISTIC eviction (kick slot =
    kick counter mod SLOTS — reproducible across runs, no RNG)."""
    i2 = _partner(i1, f, n_buckets)
    for i in (i1, i2):
        row = table[i]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            row[empty[0]] = f
            return True
    i = i1
    for kick in range(MAX_KICKS):
        slot = kick % SLOTS
        f, table[i][slot] = int(table[i][slot]), f
        i = _partner(i, f, n_buckets)
        row = table[i]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            row[empty[0]] = f
            return True
    return False


def delete(urls: DataFrame, bits_df: DataFrame, url_col: str, cfg: CuckooConfig) -> DataFrame:
    """Removes ONE matching fingerprint per url (the cuckoo filter's
    edge over bloom — re-crawl expiry without a rebuild). Only valid
    for urls that were actually inserted (standard cuckoo contract);
    deleting from an overflowed shard is a no-op (that shard already
    answers maybe-seen for everything)."""
    from .shipping import ensure_shipped_df

    ensure_shipped_df(urls)  # _del refs module helpers; see shipping.py
    urls = with_shard_cols(urls.select(url_col), url_col, cfg)
    n_buckets = cfg.buckets_per_shard

    def _del(udf_: pd.DataFrame, bdf: pd.DataFrame) -> pd.DataFrame:
        if bdf.empty:
            return pd.DataFrame({"shard": [], "bits": []}).astype({"shard": "int32"})
        shard = int(bdf["shard"].iloc[0])
        overflow, table = _load(bdf["bits"].iloc[0], n_buckets)
        if not udf_.empty and not overflow:
            fp, i1, i2 = _fp_and_buckets(udf_["_h64"].to_numpy(), n_buckets)
            for k in range(len(fp)):
                for i in (int(i1[k]), int(i2[k])):
                    slots = np.nonzero(table[i] == fp[k])[0]
                    if len(slots):
                        table[i][slots[0]] = 0
                        break
        return pd.DataFrame({"shard": [shard], "bits": [_dump(overflow, table)]})

    return (
        urls.groupBy("_shard")
        .cogroup(bits_df.groupBy("shard"))
        .applyInPandas(_del, BITS_SCHEMA)
    )
