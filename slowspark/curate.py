"""spark-submit entry point for the training-data CURATION pipeline:
filter -> exact dedup -> near dedup -> passage scrub -> sample -> pack,
with the same checkpoint-resumable stage manifests as slowspark.job.
The full optional graph (every stage resumable, every knob in the
signature): url dedup -> lang routing -> hard quality rules -> badword
blocklist -> gopher repetition -> line boilerplate -> exact dedup ->
minhash near-dup -> semantic dedup -> substring dedup -> perplexity
buckets (unigram or Stupid Backoff) -> classifier filter -> passage
scrub -> PII scrub -> exact+fuzzy decontamination -> sampling/mixture/
upsample -> BPE vocab + subword packing.

This is the corpus-side counterpart of the log pipeline: where job.py
turns raw pages into routed/aggregated entry tables, curate.py turns a
raw `documents` table (doc_id, text, lang, ...) into a training-ready
corpus plus a per-stage attrition report. Stage order is the sanctioned
one (textops docs): exact dedup BEFORE near-dup (byte-identical viral
blobs collapse to one representative before they can flood LSH buckets),
near-dup BEFORE passage scrub (no point passage-scrubbing documents that
are about to be dropped whole), scrub before sampling (rates apply to
the cleaned population), packing last (sequences index the final corpus).

Cluster usage:

    spark-submit --py-files slowspark.zip -m slowspark.curate \\
        --input <documents-parquet-or-table> --warehouse <out> \\
        [--sample-rate 1.0] [--seq-len 4096] [--min-words 20]

Every stage writes a manifest {input_signature, row_count, content_hash};
re-running with the same input + parameters skips completed stages
(checkpoint.run_stage) — at 100 TB a curation run is hours long and WILL
be preempted; resume must not recompute the signature UDFs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import DataFrame, SparkSession, functions as F

from slowspark.catalog import Catalog
from slowspark.checkpoint import run_stage
from slowspark.util import logger
from slowspark.corpus import (
    hash_sample,
    pack_sequences,
    passage_dedup,
    quality_filter_flags,
)
from slowspark.session import get_spark
from slowspark.textops import exact_dedup, minhash_dedup

_RULE_COLS = (
    "rule_word_count", "rule_mean_word_len", "rule_symbol_ratio",
    "rule_digit_ratio", "rule_stopwords",
)


def run_curation(
    spark: SparkSession,
    docs: DataFrame,
    warehouse: str,
    input_signature: str,
    min_words: int = 20,
    passage_words: int = 20,
    max_docs_per_passage: int = 2,
    sample_rate: float = 1.0,
    sample_rates: dict[str, float] | None = None,
    sample_salt: str = "",
    seq_len: int = 4096,
    eval_df: DataFrame | None = None,
    decontaminate_ngram: int = 13,
    fuzzy_decontaminate_threshold: float | None = None,
    fuzzy_decontaminate_ngram: int = 3,
    langs: list[str] | None = None,
    scrub_pii: bool = False,
    substring_dedup_n: int | None = None,
    substring_dedup_chars: int | None = None,
    embeddings_df: DataFrame | None = None,
    semantic_cells_df: DataFrame | None = None,
    semantic_n_clusters: int = 16,
    semantic_threshold: float = 0.95,
    mixture: dict[str, float] | None = None,
    target_tokens: int | None = None,
    mixture_upsample: bool = False,
    url_dedup: bool = False,
    badwords: list[str] | None = None,
    gopher_repetition: bool = False,
    line_dedup_min_df: int | None = None,
    ppl_keep_buckets: list[int] | None = None,
    ppl_n_buckets: int = 3,
    ppl_scorer: str = "unigram",
    ppl_model_df: DataFrame | None = None,
    quality_coeffs_df: DataFrame | None = None,
    quality_threshold: float = 0.5,
    quality_n_buckets: int = 1 << 15,
    bpe_merges_n: int | None = None,
    bpe_byte_level: bool = False,
    unigram_vocab: int | None = None,
    dsir_target_df: DataFrame | None = None,
    dsir_k: int | None = None,
    dsir_buckets: int = 10_000,
    dsir_alpha: float = 1.0,
    dsir_length_normalize: bool = False,
    mixture_temperature: float | None = None,
    unimax_budget: int | None = None,
    unimax_epochs: float = 1.0,
    holdout_frac: float | None = None,
    holdout_group: str = "source",
    latest_capture: bool = False,
    delta_old_df: DataFrame | None = None,
    pack_whole_docs: bool = False,
    quality_sample_k: int | None = None,
    domain_quality_threshold: float | None = None,
    domain_col: str = "source",
    max_docs_per_domain: int | None = None,
) -> dict[str, DataFrame]:
    """Full curation chain. Returns the materialized stage DataFrames;
    `filter_audit` carries the per-rule drop counts (the no-silent-drops
    rule at pipeline granularity: every document lost between stages is
    attributable to a stage and, for the filter stage, to a rule).

    Optional stages, each participating in the resume signature:
      - `langs`: keep only documents whose lang column is in the list,
        BEFORE the quality filter — the C4/Gopher rules are tuned for
        whitespace-segmented (and partly English) text, so a multilingual
        corpus routes by language first rather than letting the word-count
        rules wipe unsegmented scripts (corpus.quality_filter_flags docs);
        populate the column with textops.language_id when the source has
        none.
      - `eval_df` (a benchmark/eval table with a text column) enables the
        GPT-3-style decontamination stage between scrub and sampling —
        training-set leakage into evals is the one curation failure that
        silently corrupts every downstream measurement. The signature
        includes a content hash of eval_df (count + xxhash64 sum), so
        swapping the eval set invalidates the decontaminated/sampled/
        packed manifests even when every other knob matches.
      - `fuzzy_decontaminate_threshold` (requires `eval_df`) adds a FUZZY
        decontamination stage after the exact one: corpus docs whose word
        `fuzzy_decontaminate_ngram`-gram Jaccard against some eval doc
        clears the threshold are dropped
        (textops.decontaminate_fuzzy — cross-table MinHash-LSH
        candidates, estimate prefilter, exact verify). Catches the
        paraphrased / lightly-edited benchmark copies that share no
        verbatim 13-gram. Both knobs join the eval content hash in the
        resume signature.
      - `scrub_pii`: mask emails / IPs / phone numbers (textops.scrub_pii)
        after the passage scrub — the text that reaches sampling/packing
        is the scrubbed rendition.
      - `sample_rates`: per-stratum (lang) keep-rates for the
        deterministic hash sampler; `sample_rate` remains the default for
        strata not listed.
      - `substring_dedup_n`: exact substring dedup (Lee et al. 2022,
        textops.exact_substring_dedup) between near-dup dedup and the
        passage scrub — duplicated >= n-token runs are cut (first
        occurrence kept corpus-wide); a doc emptied by it is dropped.
        Like the passage scrub, the rewrite is in token space
        (lowercased, whitespace-normalized).
      - `substring_dedup_chars`: the suffix-array-grade char-granularity
        sibling (textops.exact_substring_dedup_chars) at the same slot —
        duplicated >= L-CHAR spans are cut exactly, case- and
        word-boundary-sensitive (the rewrite preserves original
        casing/whitespace outside the cut spans). Composable with
        `substring_dedup_n` (token pass first, then char pass).
      - `embeddings_df` (sidecar table: doc_id + embedding array) enables
        the SemDeDup semantic-dedup stage (Abbas et al. 2023) directly
        after MinHash near-dup — the published recipe's position: token
        dedup first (cheap, catches literal copies), then embedding-space
        dedup catches the paraphrase-shaped near-dups token overlap can
        never see. Drops the higher-id member of every cluster-blocked
        cosine pair >= `semantic_threshold` (min-id keeper, the
        minhash_dedup policy), via similarity.semantic_near_dup_pairs.
        A doc with no embedding row survives (the stage can only judge
        docs it has vectors for — the count delta is still attributable
        to exactly this stage). Pass `semantic_cells_df` instead (doc_id,
        embedding, ivf_cell — e.g. an IVF/IVFPQ index's cell table over
        the same corpus) to skip k-means training AND assignment: the
        standard composition when embeddings are already stored
        cell-partitioned for ANN. The embeddings CONTENT (count +
        xxhash64 sum) participates in the resume signature, like the
        eval set — swapping the embedding table invalidates every
        downstream manifest.
      - `mixture` (+ optional `target_tokens`): replace flat/per-stratum
        sampling with domain-mix TOKEN budgeting (corpus.mixture_sample)
        — per-stratum rates derived from the scrubbed corpus's measured
        token counts so the sampled output hits the given proportions at
        the largest achievable budget (or the explicit one; infeasible
        budgets raise). Mutually exclusive with `sample_rates`; strata
        not in the mixture are dropped. With `mixture_upsample=True` the
        repetition regime applies instead (rates may exceed 1; scarce
        strata repeat via corpus.repeat_sample with a per-row repeat_ix;
        default budget = the corpus's own token mass): the sampled table
        gains a repeat_ix column and packing keys on
        (doc_id, repeat_ix) so repeated copies pack as distinct
        documents — deterministically, the same copies in every run.
      - `url_dedup`: URL-canonical dedup (weburl.url_dedup — tracking
        params/case/ports/fragments collapse; min-id keeper per
        canonical class) as the FIRST stage, before even the quality
        rules — the real-crawl order: a re-fetched URL is the cheapest
        duplicate to drop, and it never reaches the text stages.
        Requires a `url` column; raises without one.
      - `badwords`: C4 word-blocklist filter (textops.badword_filter —
        whole-token matching, never substrings) directly after the hard
        quality rules; a doc containing ANY listed word is dropped.
      - `gopher_repetition`: the full Rae et al. Table A1 within-document
        repetition rules (gopherrep.gopher_repetition_flags) directly
        after the quality filter — the sanctioned pairing: the
        min-word-count rule has already run, so the short-doc top-n-gram
        caveat (gopherrep docs) does not bite.
      - `line_dedup_min_df`: RefinedWeb line-wise boilerplate removal
        (textops.line_boilerplate_dedup) BEFORE exact dedup — lines
        recurring across >= min_df documents are template chrome; with
        it stripped, docs differing only by chrome become byte-identical
        and the exact stage collapses them. A doc emptied by it is
        dropped.
      - `ppl_keep_buckets` (+ `ppl_n_buckets`): CCNet perplexity-bucket
        filter (corpus.perplexity_buckets — per-lang rank cut into
        equal-population buckets) after the dedup family, the CCNet
        order (dedup first so duplicate mass cannot skew the LM); keeps
        only docs whose bucket is in the list. `ppl_scorer='bigram'`
        swaps the corpus-unigram LM for Stupid Backoff
        (corpus.stupid_backoff_logprob), `'kneser_ney'` for the
        interpolated Kneser-Ney bigram LM (corpus.kneser_ney_logprob —
        the properly-smoothed scorer, closest to CCNet's real KenLM);
        with `ppl_model_df` the counts
        come from that REFERENCE corpus — the published CCNet shape
        (train on trusted text, score the crawl). The model corpus's
        CONTENT is hashed into the resume signature.
      - `quality_coeffs_df` (+ `quality_threshold`, `quality_n_buckets`):
        model-based quality filter — score every doc with a PRETRAINED
        linear classifier (qualityclf.score_documents; coefficient table
        (bucket, weight) with the intercept as the bucket = -1 row, the
        _qualityclf_parquet layout) and keep score >= threshold.
        `quality_n_buckets` must match the trainer's feature hashing.
        The coefficients' CONTENT is hashed into the resume signature —
        retraining the model invalidates downstream manifests even when
        every knob matches.
      - `bpe_merges_n`: learn a BPE vocabulary of that many merges ON
        THE SAMPLED CORPUS (bpe.bpe_learn — the tokenizer is trained on
        what will actually be packed), persist the merge table as the
        `bpe_vocab` stage, and pack in TOKENIZER subword counts
        (with `bpe_byte_level` both steps run in GPT-2 byte mode:
        pre-tokenized, case/space-preserving, no OOV)
        (bpe.bpe_segment → pack_sequences n_tokens_col) instead of
        whitespace tokens — the unit the training loader consumes.
        Composes with the repetition regime (repeated copies pack by
        their subword counts too).
      - `dsir_target_df` (+ required `dsir_k`, optional `dsir_buckets`):
        DSIR importance resampling (Xie et al. 2023, dsir.dsir_topk) AS
        the sampling stage — the quality-targeting sampler: keep the
        dsir_k scrubbed documents whose hashed-n-gram likelihood ratio
        against the target corpus wins the Gumbel top-k, seeded by
        sample_salt. Default scoring is the paper's RAW log-ratio sum
        (selection is then sharply proportional to the likelihood
        ratio; the paper length-chunks documents first) —
        `dsir_length_normalize=True` switches to the mean-per-gram
        score for unchunked mixed-length corpora, at the cost of the
        Gumbel noise dominating when per-gram domain separation is
        small (dsir_log_weights docstring). MUTUALLY EXCLUSIVE with `mixture`
        and `sample_rates`: all three answer the same question — which
        rows survive the sampling slot — and composing two samplers
        would make the attrition at the `sampled` stage unattributable
        to a single policy (run two curations, or pre-mix the DSIR
        target, instead). The target corpus's CONTENT (count + xxhash64
        sum of text) joins the resume signature like the eval set:
        swapping the target invalidates sampled/packed manifests even
        when every knob matches. The attrition row is the standard
        `sampled` stage_rows entry: scrubbed -> dsir_k rows.
      - `mixture_temperature` (T): temperature-scaled domain mixing —
        target proportions derived as (token share)^(1/T)
        (corpus.temperature_mixture_props, the multilingual-T5 rule)
        then the standard mixture_sample path; composes with
        `target_tokens`. Mutually exclusive with the other sampling
        policies (same one-policy rule as DSIR).
      - `unimax_budget` (+ `unimax_epochs`): UniMax water-filled token
        budgets (corpus.unimax_sample) — as uniform as possible subject
        to the per-stratum epoch cap; output always carries repeat_ix
        (epochs > 1 repeat scarce strata deterministically) and packing
        keys on (doc_id, repeat_ix) like the upsample regime. Mutually
        exclusive with the other sampling policies.
      - `holdout_frac` (+ `holdout_group`, default 'source'): carve a
        leakage-safe validation set (corpus.holdout_split — assignment
        at GROUP granularity so within-group near-dups never straddle
        the split) from the fully scrubbed/decontaminated corpus,
        BEFORE the sampling slot: the `holdout_val` table is written
        and the sampling policy then sees only the train side
        (`holdout_train`) — val content can never leak into the packed
        training corpus, and the holdout is frozen under sample-policy
        changes (same sample_salt keys the group hash, so the identical
        salt carves the identical holdout across runs and crawls).
        Composes with every sampling policy; both stage tables carry
        the standard attrition rows.
      - `latest_capture`: consolidate a multi-capture input (a corpus
        spanning several crawl snapshots, e.g. WARC ingest where the
        same URL was refetched) to its NEWEST capture per URL
        (weburl.latest_capture, max (warc_ts, doc_id) keeper) as the
        very first stage — training on every capture of a news homepage
        is duplication by another name. Requires `url` and `warc_ts`
        columns.
      - `delta_old_df` (a previous snapshot with url + fingerprint —
        md5(text) contract — or url + text): incremental-ingest filter
        (weburl.keep_new_or_changed) right after capture consolidation
        — only NEW or CHANGED URLs flow into curation; the 10^12 pages
        that didn't move since last month are dropped at the front
        door, which is the cheapest place a page can be dropped. The
        old snapshot's CONTENT (count + xxhash64 over url+fingerprint)
        joins the resume signature — re-pointing at a different
        snapshot invalidates every downstream manifest.
      - `pack_whole_docs`: replace concat-chunk packing with
        whole-document next-fit bin packing (corpus.pack_bins) — no
        document ever splits across training sequences; over-length
        docs get a dedicated bin with a `truncated` flag. The packed
        table's schema becomes (doc_id, shard, n_tokens, bin_ix,
        bin_offset, truncated). Mutually exclusive with the repetition
        regimes (`mixture_upsample`/`unimax_budget`) whose packing
        keys on (doc_id, repeat_ix).
      - `quality_sample_k` (requires `quality_coeffs_df`): SOFT quality
        selection as the sampling policy — every scrubbed doc gets the
        classifier's sigmoid score as a sampling WEIGHT and
        corpus.weighted_sample_k keeps k docs without replacement
        (Efraimidis-Spirakis, seeded by sample_salt): high-quality docs
        are strongly preferred but a borderline doc still has
        proportional probability — the soft alternative to the hard
        `quality_threshold` cut, which this policy REPLACES (the
        quality_filtered stage is skipped; thresholding then weighting
        with the same model would double-count it). Docs the feature
        pass cannot score (zero tokens) weigh sigmoid(intercept).
        Mutually exclusive with the other sampling policies."""
    if mixture and sample_rates:
        raise ValueError(
            "run_curation: mixture and sample_rates are mutually exclusive"
        )
    if (dsir_target_df is None) != (dsir_k is None):
        raise ValueError(
            "run_curation: dsir_target_df and dsir_k go together"
        )
    if dsir_target_df is not None and (mixture or sample_rates):
        raise ValueError(
            "run_curation: dsir_target_df is mutually exclusive with "
            "mixture and sample_rates (one sampling policy per run)"
        )
    n_policies = sum(
        x is not None and x is not False and x != {}
        for x in (
            sample_rates or None, mixture or None, dsir_target_df,
            mixture_temperature, unimax_budget, quality_sample_k,
        )
    )
    if n_policies > 1:
        raise ValueError(
            "run_curation: sample_rates / mixture / dsir_target_df / "
            "mixture_temperature / unimax_budget / quality_sample_k "
            "are mutually exclusive (one sampling policy per run)"
        )
    if quality_sample_k is not None and quality_coeffs_df is None:
        raise ValueError(
            "run_curation: quality_sample_k requires quality_coeffs_df"
        )
    if unimax_epochs != 1.0 and unimax_budget is None:
        raise ValueError(
            "run_curation: unimax_epochs requires unimax_budget"
        )
    if mixture_upsample and not mixture:
        raise ValueError(
            "run_curation: mixture_upsample requires a mixture"
        )
    if pack_whole_docs and (mixture_upsample or unimax_budget is not None):
        raise ValueError(
            "run_curation: pack_whole_docs is mutually exclusive with "
            "the repetition regimes (their packing keys on "
            "(doc_id, repeat_ix))"
        )
    if fuzzy_decontaminate_threshold is not None and eval_df is None:
        raise ValueError(
            "run_curation: fuzzy_decontaminate_threshold requires eval_df"
        )
    cat = Catalog(warehouse)
    if eval_df is not None:
        # sum in decimal(38,0): a long sum of xxhash64 values overflows
        # (and raises under ANSI mode) as soon as a couple of rows share
        # a sign; decimal keeps the content hash exact at any row count
        ev = eval_df.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("text").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).first()
        fz = (
            f"{fuzzy_decontaminate_threshold}:{fuzzy_decontaminate_ngram}"
            if fuzzy_decontaminate_threshold is not None else "off"
        )
        eval_sig = f"{decontaminate_ngram}:{fz}:{ev['n']}:{ev['h']}"
    else:
        eval_sig = "0"
    rates_sig = ",".join(
        f"{k}={v}" for k, v in sorted((sample_rates or {}).items())
    )
    sem_src = semantic_cells_df if semantic_cells_df is not None else embeddings_df
    if sem_src is not None:
        # content hash, same discipline as the eval set: resume must miss
        # when the embedding table changes, not just when knobs change.
        # For a pre-assigned cell table the CELL ASSIGNMENTS are part of
        # the content (rebuilding the IVF index with a different seed
        # keeps doc_id+embedding identical but moves docs across cells,
        # which changes the cluster-blocked pair set) — hash ivf_cell too
        hash_cols = [
            F.col("doc_id").cast("string"),
            F.col("embedding").cast("string"),
        ]
        if semantic_cells_df is not None:
            hash_cols.append(F.col("ivf_cell").cast("string"))
        eh = sem_src.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64(*hash_cols).cast("decimal(38,0)")),
                F.lit(0),
            ).alias("h"),
        ).first()
        sem_sig = (
            f"{semantic_n_clusters}:{semantic_threshold}"
            f":{int(semantic_cells_df is not None)}:{eh['n']}:{eh['h']}"
        )
    else:
        sem_sig = "0"
    if quality_coeffs_df is not None:
        qh = quality_coeffs_df.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(
                    F.xxhash64(
                        F.col("bucket").cast("string"),
                        F.col("weight").cast("string"),
                    ).cast("decimal(38,0)")
                ),
                F.lit(0),
            ).alias("h"),
        ).first()
        qc_sig = (
            f"{quality_threshold}:{quality_n_buckets}:{qh['n']}:{qh['h']}"
        )
    else:
        qc_sig = "0"
    if ppl_scorer not in ("unigram", "bigram", "kneser_ney"):
        raise ValueError(
            f"run_curation: ppl_scorer must be 'unigram', 'bigram', or"
            f" 'kneser_ney', got {ppl_scorer!r}"
        )
    if ppl_model_df is not None:
        pm = ppl_model_df.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("text").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).first()
        ppl_model_sig = f"{pm['n']}:{pm['h']}"
    else:
        ppl_model_sig = "self"
    if dsir_target_df is not None:
        dt = dsir_target_df.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("text").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).first()
        dsir_sig = (
            f"{dsir_k}:{dsir_buckets}:{dsir_alpha}"
            f":{int(dsir_length_normalize)}:{dt['n']}:{dt['h']}"
        )
    else:
        dsir_sig = "off"
    if delta_old_df is not None:
        fp = (
            F.col("fingerprint") if "fingerprint" in delta_old_df.columns
            else F.md5("text")
        )
        dd = delta_old_df.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(
                    F.xxhash64(F.col("url"), fp).cast("decimal(38,0)")
                ),
                F.lit(0),
            ).alias("h"),
        ).first()
        delta_sig = f"{dd['n']}:{dd['h']}"
    else:
        delta_sig = "off"
    sig = (
        f"{input_signature}|mw={min_words}|pw={passage_words}"
        f"|mdp={max_docs_per_passage}|sr={sample_rate}|srates={rates_sig}"
        f"|salt={sample_salt}"
        f"|sl={seq_len}|decon={eval_sig}"
        f"|langs={','.join(sorted(langs)) if langs else '*'}"
        f"|pii={int(scrub_pii)}|ssd={substring_dedup_n or 0}"
        f"|ssc={substring_dedup_chars or 0}"
        f"|sem={sem_sig}"
        f"|mix={','.join(f'{k}={v}' for k, v in sorted((mixture or {}).items()))}"
        f"|tt={target_tokens or 0}|mup={int(mixture_upsample)}"
        f"|ud={int(url_dedup)}"
        f"|bw={','.join(sorted(w.lower() for w in badwords)) if badwords else 'off'}"
        f"|gop={int(gopher_repetition)}|ldf={line_dedup_min_df or 0}"
        f"|ppl={','.join(map(str, sorted(ppl_keep_buckets))) if ppl_keep_buckets else 'off'}"
        f":{ppl_n_buckets}:{ppl_scorer}:{ppl_model_sig}"
        f"|qc={qc_sig}|bpe={bpe_merges_n or 0}"
        f"|bbl={int(bpe_byte_level)}|uni={unigram_vocab or 0}"
        f"|dsir={dsir_sig}"
        f"|mtemp={mixture_temperature if mixture_temperature is not None else 'off'}"
        f"|umax={unimax_budget or 0}:{unimax_epochs}"
        f"|ho={holdout_frac if holdout_frac is not None else 'off'}"
        f":{holdout_group}"
        f"|lc={int(latest_capture)}|dold={delta_sig}"
        f"|pwd={int(pack_whole_docs)}|qsk={quality_sample_k or 0}"
        f"|domq={domain_quality_threshold if domain_quality_threshold is not None else 'off'}"
        f":{domain_col}|domcap={max_docs_per_domain or 0}"
    )
    out: dict[str, DataFrame] = {}

    if latest_capture:
        missing = [c for c in ("url", "warc_ts") if c not in docs.columns]
        if missing:
            raise ValueError(
                f"run_curation: latest_capture=True requires url and "
                f"warc_ts columns (missing {missing})"
            )
        from slowspark.weburl import latest_capture as _lc_fn

        lc_cols = docs.columns

        def _lc() -> DataFrame:
            return _lc_fn(docs).select(*lc_cols)

        docs = run_stage(spark, cat, "latest_captured", sig, _lc)
        out["latest_captured"] = docs

    if delta_old_df is not None:
        if "url" not in docs.columns:
            raise ValueError(
                "run_curation: delta_old_df requires a 'url' column"
            )
        from slowspark.weburl import keep_new_or_changed

        def _delta() -> DataFrame:
            return keep_new_or_changed(docs, delta_old_df)

        docs = run_stage(spark, cat, "delta_ingested", sig, _delta)
        out["delta_ingested"] = docs

    if url_dedup:
        if "url" not in docs.columns:
            raise ValueError(
                "run_curation: url_dedup=True requires a 'url' column"
            )
        from slowspark.weburl import url_dedup as _url_dedup_fn

        cols = docs.columns

        def _udedup() -> DataFrame:
            return _url_dedup_fn(docs).select(*cols)

        docs = run_stage(spark, cat, "url_deduped", sig, _udedup)
        out["url_deduped"] = docs

    if langs is not None:
        docs = run_stage(
            spark, cat, "lang_filtered", sig,
            lambda: docs.filter(F.col("lang").isin(list(langs))),
        )
        out["lang_filtered"] = docs

    flagged = run_stage(
        spark, cat, "flagged", sig,
        lambda: quality_filter_flags(docs, min_words=min_words),
    )
    out["filter_audit"] = run_stage(
        spark, cat, "filter_audit", sig,
        lambda: flagged.agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("int")).alias("n_kept"),
            *[
                F.sum((~F.col(c)).cast("int")).alias(f"dropped_by_{c}")
                for c in _RULE_COLS
            ],
        ),
    )
    filtered = run_stage(
        spark, cat, "filtered", sig,
        lambda: flagged.filter(F.col("keep")).select(*docs.columns),
    )
    out["filtered"] = filtered

    if badwords:
        from slowspark.textops import badword_filter

        def _badwords() -> DataFrame:
            return (
                badword_filter(filtered, list(badwords))
                .filter(F.col("keep"))
                .select(*filtered.columns)
            )

        filtered = run_stage(spark, cat, "badword_filtered", sig, _badwords)
        out["badword_filtered"] = filtered

    if gopher_repetition:
        from slowspark.gopherrep import gopher_repetition_flags

        def _gopher() -> DataFrame:
            keep_ids = (
                gopher_repetition_flags(filtered)
                .filter(F.col("keep"))
                .select("doc_id")
            )
            return filtered.join(keep_ids, "doc_id", "left_semi")

        filtered = run_stage(spark, cat, "gopher_filtered", sig, _gopher)
        out["gopher_filtered"] = filtered

    if domain_quality_threshold is not None:
        # RefinedWeb-style site-level gating: drop WHOLE domains whose
        # mean heuristic quality falls below the threshold — spam sites'
        # occasional fluent page survives per-doc rules; its domain mean
        # does not. Runs after the per-doc filter so the mean is over
        # rule-surviving docs.
        if domain_col not in filtered.columns:
            raise ValueError(
                f"--domain-quality-threshold needs a '{domain_col}' column "
                f"(have: {filtered.columns}); pass --domain-col"
            )
        from slowspark.corpus import domain_quality_filter

        def _domq() -> DataFrame:
            keep = domain_quality_filter(
                filtered,
                domain_col=domain_col,
                min_mean_quality=domain_quality_threshold,
            ).filter(F.col("domain_keep"))
            return filtered.join(
                F.broadcast(keep.select(F.col("domain").alias(domain_col))),
                domain_col,
                "left_semi",
            )

        filtered = run_stage(spark, cat, "domain_filtered", sig, _domq)
        out["domain_filtered"] = filtered

    if max_docs_per_domain is not None:
        # C4-style per-host cap: a single spam domain must not dominate
        # the corpus however many pages it serves. Deterministic
        # md5-rank keeper (exact_k_sample) — same rows win in every
        # run/engine; domains under the cap are untouched. Runs after
        # the per-doc/domain quality gates, before dedup (the cap is an
        # ingest-side volume guard, not a dedup policy).
        if domain_col not in filtered.columns:
            raise ValueError(
                f"--max-docs-per-domain needs a '{domain_col}' column "
                f"(have: {filtered.columns}); pass --domain-col"
            )
        from slowspark.corpus import exact_k_sample

        def _domcap() -> DataFrame:
            over = (
                filtered.groupBy(domain_col)
                .agg(F.count("*").alias("__n"))
                .filter(F.col("__n") > max_docs_per_domain)
                .agg(
                    F.count("*").alias("nd"),
                    F.coalesce(
                        F.sum(F.col("__n") - max_docs_per_domain), F.lit(0)
                    ).alias("nr"),
                )
                .first()
            )
            if over["nd"]:
                logger.warning(
                    "max_docs_per_domain=%d capped %d domain(s), "
                    "dropping %d row(s) (no-silent-drops rule)",
                    max_docs_per_domain, over["nd"], over["nr"],
                )
            return exact_k_sample(
                filtered, max_docs_per_domain,
                stratum_col=domain_col, salt="domcap",
            )

        filtered = run_stage(spark, cat, "domain_capped", sig, _domcap)
        out["domain_capped"] = filtered

    if line_dedup_min_df is not None:
        from slowspark.textops import line_boilerplate_dedup

        def _linededup() -> DataFrame:
            ld = line_boilerplate_dedup(
                filtered, min_df=line_dedup_min_df, with_text=True
            )
            return (
                filtered.drop("text")
                .join(ld.select("doc_id", "kept_text"), "doc_id")
                .filter(F.col("kept_text") != "")
                .withColumnRenamed("kept_text", "text")
                .select(*filtered.columns)
            )

        filtered = run_stage(spark, cat, "line_deduped", sig, _linededup)
        out["line_deduped"] = filtered

    deduped_exact = run_stage(
        spark, cat, "deduped_exact", sig, lambda: exact_dedup(filtered)
    )
    out["deduped_exact"] = deduped_exact

    deduped = run_stage(
        spark, cat, "deduped_near", sig, lambda: minhash_dedup(deduped_exact)
    )
    out["deduped_near"] = deduped

    if sem_src is not None:
        from slowspark.similarity import semantic_near_dup_pairs

        def _sem() -> DataFrame:
            # judge only docs still alive after token-level dedup: a doc
            # already dropped must not also kill its semantic twin
            alive = sem_src.join(deduped.select("doc_id"), "doc_id", "left_semi")
            pairs = semantic_near_dup_pairs(
                alive,
                vec_col="embedding",
                id_col="doc_id",
                n_clusters=semantic_n_clusters,
                cosine_threshold=semantic_threshold,
                assigned=alive if semantic_cells_df is not None else None,
            )
            losers = pairs.select(
                F.greatest("id_a", "id_b").alias("doc_id")
            ).distinct()
            return deduped.join(losers, "doc_id", "left_anti")

        deduped = run_stage(spark, cat, "semantic_deduped", sig, _sem)
        out["semantic_deduped"] = deduped

    if substring_dedup_n is not None:
        from slowspark.textops import exact_substring_dedup

        def _substr() -> DataFrame:
            sd = exact_substring_dedup(
                deduped, n=substring_dedup_n, with_text=True
            )
            return (
                deduped.drop("text")
                .join(sd.select("doc_id", "kept_text"), "doc_id")
                .filter(F.col("kept_text") != "")
                .withColumnRenamed("kept_text", "text")
                .select(*deduped.columns)
            )

        deduped = run_stage(spark, cat, "substring_deduped", sig, _substr)
        out["substring_deduped"] = deduped

    if substring_dedup_chars is not None:
        from slowspark.textops import exact_substring_dedup_chars

        def _substr_chars() -> DataFrame:
            sd = exact_substring_dedup_chars(
                deduped, min_len=substring_dedup_chars, with_text=True
            )
            return (
                deduped.drop("text")
                .join(sd.select("doc_id", "kept_text"), "doc_id")
                .filter(F.col("kept_text") != "")
                .withColumnRenamed("kept_text", "text")
                .select(*deduped.columns)
            )

        deduped = run_stage(
            spark, cat, "substring_char_deduped", sig, _substr_chars
        )
        out["substring_char_deduped"] = deduped

    if ppl_keep_buckets is not None:
        from slowspark.corpus import perplexity_buckets

        def _ppl() -> DataFrame:
            lang_col = "lang" if "lang" in deduped.columns else None
            scored = None
            if ppl_scorer == "bigram":
                from slowspark.corpus import stupid_backoff_logprob

                scored = stupid_backoff_logprob(
                    deduped, model_df=ppl_model_df
                )
            elif ppl_scorer == "kneser_ney":
                from slowspark.corpus import kneser_ney_logprob

                scored = kneser_ney_logprob(
                    deduped, model_df=ppl_model_df
                )
            keep_ids = (
                perplexity_buckets(
                    deduped, lang_col=lang_col, n_buckets=ppl_n_buckets,
                    scored_df=scored,
                )
                .filter(F.col("ppl_bucket").isin([int(b) for b in ppl_keep_buckets]))
                .select("doc_id")
            )
            return deduped.join(keep_ids, "doc_id", "left_semi")

        deduped = run_stage(spark, cat, "ppl_filtered", sig, _ppl)
        out["ppl_filtered"] = deduped

    if quality_coeffs_df is not None and quality_sample_k is None:
        from slowspark.qualityclf import hashed_text_features, score_documents

        def _qclf() -> DataFrame:
            feats = hashed_text_features(deduped, n_buckets=quality_n_buckets)
            intercept = quality_coeffs_df.filter(
                F.col("bucket") == -1
            ).collect()
            b = float(intercept[0]["weight"]) if intercept else 0.0
            scores = score_documents(
                feats, quality_coeffs_df.filter(F.col("bucket") >= 0), b
            )
            keep_ids = scores.filter(
                F.col("score") >= float(quality_threshold)
            ).select(F.col("id").alias("doc_id"))
            return deduped.join(keep_ids, "doc_id", "left_semi")

        deduped = run_stage(spark, cat, "quality_filtered", sig, _qclf)
        out["quality_filtered"] = deduped

    def _scrub() -> DataFrame:
        scrubbed = passage_dedup(
            deduped,
            passage_words=passage_words,
            max_docs_per_passage=max_docs_per_passage,
            with_text=True,
        )
        # rewrite text to the boilerplate-free reassembly; a doc whose
        # every passage was boilerplate is dropped (nothing left to train
        # on) — the count delta vs deduped_near is the audit trail
        return (
            deduped.drop("text")
            .join(scrubbed.select("doc_id", "kept_text"), "doc_id")
            .filter(F.col("kept_text") != "")
            .withColumnRenamed("kept_text", "text")
            .select(*deduped.columns)
        )

    scrubbed = run_stage(spark, cat, "scrubbed", sig, _scrub)
    out["scrubbed"] = scrubbed

    if scrub_pii:
        from slowspark.textops import scrub_pii as _scrub_pii_fn

        def _pii() -> DataFrame:
            cols = scrubbed.columns
            return (
                _scrub_pii_fn(scrubbed)
                .drop("text")
                .withColumnRenamed("text_scrubbed", "text")
                .select(*cols)
            )

        scrubbed = run_stage(spark, cat, "pii_scrubbed", sig, _pii)
        out["pii_scrubbed"] = scrubbed

    if eval_df is not None:
        from slowspark.textops import decontaminate

        scrubbed = run_stage(
            spark, cat, "decontaminated", sig,
            lambda: decontaminate(scrubbed, eval_df, n=decontaminate_ngram),
        )
        out["decontaminated"] = scrubbed

    if fuzzy_decontaminate_threshold is not None:
        from slowspark.textops import decontaminate_fuzzy

        # the eval side needs an id column for the cross-table band join;
        # an eval parquet that carries none gets a deterministic
        # content-derived one (identity is irrelevant — only corpus
        # doc_ids are dropped)
        ev_df = (
            eval_df if "doc_id" in eval_df.columns
            else eval_df.withColumn("doc_id", F.xxhash64("text"))
        )

        def _fuzzy() -> DataFrame:
            return decontaminate_fuzzy(
                scrubbed, ev_df,
                jaccard_threshold=fuzzy_decontaminate_threshold,
                ngram_n=fuzzy_decontaminate_ngram,
            )

        scrubbed = run_stage(spark, cat, "fuzzy_decontaminated", sig, _fuzzy)
        out["fuzzy_decontaminated"] = scrubbed

    if holdout_frac is not None:
        from slowspark.corpus import holdout_split

        if holdout_group not in scrubbed.columns:
            raise ValueError(
                f"run_curation: holdout_group column {holdout_group!r} "
                f"not in the corpus (have {scrubbed.columns})"
            )

        def _holdout(side: str):
            def _f() -> DataFrame:
                return holdout_split(
                    scrubbed, holdout_frac, holdout_group,
                    salt=sample_salt,
                ).filter(F.col("split") == side).drop("split")
            return _f

        out["holdout_val"] = run_stage(
            spark, cat, "holdout_val", sig, _holdout("val")
        )
        scrubbed = run_stage(
            spark, cat, "holdout_train", sig, _holdout("train")
        )
        out["holdout_train"] = scrubbed

    if quality_sample_k is not None:
        import math

        from slowspark.corpus import weighted_sample_k
        from slowspark.qualityclf import (
            hashed_text_features,
            score_documents,
        )

        qs_cols = scrubbed.columns

        def _qsample() -> DataFrame:
            feats = hashed_text_features(
                scrubbed, n_buckets=quality_n_buckets
            )
            icpt = quality_coeffs_df.filter(F.col("bucket") == -1).collect()
            b = float(icpt[0]["weight"]) if icpt else 0.0
            scores = score_documents(
                feats, quality_coeffs_df.filter(F.col("bucket") >= 0), b
            ).withColumnRenamed("id", "doc_id")
            wdf = scrubbed.join(scores, "doc_id", "left").withColumn(
                "__qw",
                F.coalesce(
                    F.col("score"), F.lit(1.0 / (1.0 + math.exp(-b)))
                ),
            )
            return weighted_sample_k(
                wdf, "__qw", int(quality_sample_k), seed=sample_salt
            ).select(*qs_cols)

        sampled = run_stage(spark, cat, "sampled", sig, _qsample)
    elif dsir_target_df is not None:
        from slowspark.dsir import dsir_topk

        cols = scrubbed.columns

        def _dsir() -> DataFrame:
            picked = dsir_topk(
                scrubbed, dsir_target_df, k=int(dsir_k),
                n_buckets=dsir_buckets, alpha=dsir_alpha,
                seed=sample_salt,
                length_normalize=dsir_length_normalize,
            ).select("doc_id")
            # inner join back: keep the scrubbed schema (the dsir score
            # columns stay in the dsir stage, not the training corpus)
            return scrubbed.join(picked, "doc_id").select(*cols)

        sampled = run_stage(spark, cat, "sampled", sig, _dsir)
    elif mixture_temperature is not None:
        from slowspark.corpus import mixture_sample, temperature_mixture_props

        def _tempmix() -> DataFrame:
            props = temperature_mixture_props(scrubbed, mixture_temperature)
            return mixture_sample(
                scrubbed, props, target_tokens=target_tokens,
                salt=sample_salt,
            )

        sampled = run_stage(spark, cat, "sampled", sig, _tempmix)
    elif unimax_budget is not None:
        from slowspark.corpus import unimax_sample

        sampled = run_stage(
            spark, cat, "sampled", sig,
            lambda: unimax_sample(
                scrubbed, unimax_budget, unimax_epochs, salt=sample_salt
            ),
        )
    elif mixture and mixture_upsample:
        from slowspark.corpus import mixture_rates, repeat_sample

        def _upsampled() -> DataFrame:
            rates, _t = mixture_rates(
                scrubbed, dict(mixture), target_tokens=target_tokens,
                allow_upsample=True,
            )
            return repeat_sample(scrubbed, rates, salt=sample_salt)

        sampled = run_stage(spark, cat, "sampled", sig, _upsampled)
    elif mixture:
        from slowspark.corpus import mixture_sample

        sampled = run_stage(
            spark, cat, "sampled", sig,
            lambda: mixture_sample(
                scrubbed, dict(mixture), target_tokens=target_tokens,
                salt=sample_salt,
            ),
        )
    else:
        sampled = run_stage(
            spark, cat, "sampled", sig,
            lambda: hash_sample(
                scrubbed, rates=dict(sample_rates or {}),
                default_rate=sample_rate, salt=sample_salt,
            ),
        )
    out["sampled"] = sampled

    pack_tokens_col = None
    if bpe_byte_level and bpe_merges_n is None:
        raise ValueError(
            "run_curation: bpe_byte_level requires bpe_merges_n"
        )
    if unigram_vocab is not None and bpe_merges_n is not None:
        raise ValueError(
            "run_curation: unigram_vocab and bpe_merges_n are mutually "
            "exclusive — one tokenizer decides the packing budget"
        )
    if unigram_vocab is not None:
        from slowspark.unigramlm import unigram_segment, unigram_train

        def _uni_vocab() -> DataFrame:
            return unigram_train(sampled, vocab_size=unigram_vocab)

        uni_model = run_stage(spark, cat, "unigram_vocab", sig, _uni_vocab)
        out["unigram_vocab"] = uni_model

        def _uni_counts() -> DataFrame:
            return unigram_segment(
                sampled.select("doc_id", "text").dropDuplicates(["doc_id"]),
                uni_model,
            ).select("doc_id", F.col("n_tokens").alias("unigram_n_tokens"))

        ucounts = run_stage(spark, cat, "unigram_counts", sig, _uni_counts)
        # LEFT join + zero-fill (ADVICE r8): a doc whose text yields no
        # whitespace tokens gets no segmenter row; an inner join would
        # silently drop it before packing (no-silent-drops rule)
        sampled = sampled.join(ucounts, "doc_id", "left").withColumn(
            "unigram_n_tokens",
            F.coalesce("unigram_n_tokens", F.lit(0)),
        )
        pack_tokens_col = "unigram_n_tokens"
    if bpe_merges_n is not None:
        from slowspark.bpe import bpe_learn, bpe_segment

        def _vocab() -> DataFrame:
            merges = bpe_learn(
                sampled, bpe_merges_n, byte_level=bpe_byte_level
            )
            return spark.createDataFrame(
                [
                    (m["merge_ix"], m["left"], m["right"], m["merged"],
                     m["pair_count"])
                    for m in merges
                ],
                "merge_ix int, lhs string, rhs string, merged string,"
                " pair_count long",
            )

        vocab = run_stage(spark, cat, "bpe_vocab", sig, _vocab)
        out["bpe_vocab"] = vocab
        merges = [
            {"left": r["lhs"], "right": r["rhs"], "merged": r["merged"]}
            for r in vocab.orderBy("merge_ix").collect()
        ]

        def _counts() -> DataFrame:
            # one count per distinct doc; upsample repeats join by doc_id
            return bpe_segment(
                sampled.select("doc_id", "text").dropDuplicates(["doc_id"]),
                merges, byte_level=bpe_byte_level, counts_only=True,
            ).select("doc_id", F.col("n_tokens").alias("bpe_n_tokens"))

        counts = run_stage(spark, cat, "bpe_counts", sig, _counts)
        # LEFT join + zero-fill (ADVICE r8, same latent gap as the
        # unigram branch): zero-token docs must survive to packing
        sampled = sampled.join(counts, "doc_id", "left").withColumn(
            "bpe_n_tokens", F.coalesce("bpe_n_tokens", F.lit(0))
        )
        pack_tokens_col = "bpe_n_tokens"

    if mixture_upsample or unimax_budget is not None:
        # repeated copies are distinct documents to the packer: key the
        # global concat order on (doc_id, repeat_ix), then flatten back
        def _packed() -> DataFrame:
            # NOT named __pid: pack_sequences uses that internally for
            # its range-partition id and would overwrite the struct
            p = pack_sequences(
                sampled.withColumn(
                    "__packkey", F.struct("doc_id", "repeat_ix")
                ),
                seq_len=seq_len,
                id_col="__packkey",
                n_tokens_col=pack_tokens_col,
            )
            return p.select(
                F.col("__packkey.doc_id").alias("doc_id"),
                F.col("__packkey.repeat_ix").alias("repeat_ix"),
                "n_tokens", "seq_id", "seq_offset",
            )

        out["packed"] = run_stage(spark, cat, "packed", sig, _packed)
    elif pack_whole_docs:
        from slowspark.corpus import pack_bins

        out["packed"] = run_stage(
            spark, cat, "packed", sig,
            lambda: pack_bins(
                sampled, seq_len=seq_len, n_tokens_col=pack_tokens_col
            ),
        )
    else:
        out["packed"] = run_stage(
            spark, cat, "packed", sig,
            lambda: pack_sequences(
                sampled, seq_len=seq_len, n_tokens_col=pack_tokens_col
            ),
        )
    return out


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="documents parquet path (or WARC glob with "
                   "--input-format warc)")
    p.add_argument("--input-format", default="parquet",
                   choices=("parquet", "warc", "jsonl"),
                   help="'warc' reads Common-Crawl-style WARC files "
                   "(sources.read_warc): doc_id = xxhash64(url), text = "
                   "UTF-8-decoded payload, lang detected with "
                   "textops.language_id — the real crawl entry point; "
                   "'jsonl' reads JSONL(.gz) dataset releases "
                   "(sources.read_jsonl, FAILFAST, requires doc_id + "
                   "text; lang detected when absent)")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--master", default=None)
    p.add_argument("--min-words", type=int, default=20)
    p.add_argument("--passage-words", type=int, default=20)
    p.add_argument("--max-docs-per-passage", type=int, default=2)
    p.add_argument("--sample-rate", type=float, default=1.0)
    p.add_argument("--sample-rates", default=None,
                   help="per-stratum rates as lang=rate[,lang=rate...], "
                   "e.g. 'en=0.5,zh=1.0'; --sample-rate stays the default "
                   "for unlisted strata")
    p.add_argument("--sample-salt", default="")
    p.add_argument("--seq-len", type=int, default=4096)
    p.add_argument("--eval-set", default=None,
                   help="eval/benchmark parquet with a text column: enables "
                   "the n-gram decontamination stage")
    p.add_argument("--decontaminate-ngram", type=int, default=13)
    p.add_argument("--fuzzy-decontaminate-threshold", type=float,
                   default=None,
                   help="word-n-gram Jaccard threshold for FUZZY "
                   "decontamination against --eval-set (catches "
                   "paraphrased eval copies exact n-gram overlap misses); "
                   "runs after the exact stage")
    p.add_argument("--fuzzy-decontaminate-ngram", type=int, default=3)
    p.add_argument("--langs", default=None,
                   help="comma-separated language allowlist (lang column); "
                   "filters BEFORE the quality rules")
    p.add_argument("--scrub-pii", action="store_true",
                   help="mask emails/IPs/phone numbers after passage scrub")
    p.add_argument("--substring-dedup-n", type=int, default=None,
                   help="exact substring dedup window (tokens): duplicated "
                   ">= n-token runs are cut, first occurrence kept")
    p.add_argument("--substring-dedup-chars", type=int, default=None,
                   help="suffix-array-grade exact substring dedup (CHARS): "
                   "duplicated >= L-char spans are cut exactly, first "
                   "occurrence kept")
    p.add_argument("--semantic-dedup-embeddings", default=None,
                   help="sidecar parquet (doc_id, embedding array): enables "
                   "the SemDeDup semantic-dedup stage after near-dup")
    p.add_argument("--semantic-dedup-cells", default=None,
                   help="pre-assigned cell parquet (doc_id, embedding, "
                   "ivf_cell — e.g. an IVF index's cell table): enables the "
                   "semantic-dedup stage WITHOUT k-means training/assignment")
    p.add_argument("--semantic-n-clusters", type=int, default=16)
    p.add_argument("--semantic-threshold", type=float, default=0.95)
    p.add_argument("--mixture", default=None,
                   help="domain-mix token budgeting as lang=prop[,...] "
                   "(e.g. 'en=0.6,de=0.4'): per-stratum rates derived from "
                   "measured token counts; unlisted strata dropped; "
                   "mutually exclusive with --sample-rates")
    p.add_argument("--target-tokens", type=int, default=None,
                   help="explicit mixture token budget (default: largest "
                   "achievable; infeasible budgets fail loudly)")
    p.add_argument("--url-dedup", action="store_true",
                   help="URL-canonical dedup as the first stage "
                   "(requires a url column)")
    p.add_argument("--badwords", default=None,
                   help="comma-separated word blocklist (C4 style, "
                   "whole-token matching): any hit drops the doc")
    p.add_argument("--gopher-repetition", action="store_true",
                   help="apply the full Gopher Table A1 within-document "
                   "repetition rules after the quality filter")
    p.add_argument("--domain-quality-threshold", type=float, default=None,
                   help="drop WHOLE domains whose mean heuristic quality "
                        "is below this (RefinedWeb site-level gating); "
                        "needs the --domain-col column")
    p.add_argument("--domain-col", default="source",
                   help="domain/site column for --domain-quality-threshold "
                        "(default: source)")
    p.add_argument("--max-docs-per-domain", type=int, default=None,
                   help="C4-style per-domain volume cap: keep at most N "
                        "docs per --domain-col value (deterministic "
                        "md5-rank keeper; capped domains are logged)")
    p.add_argument("--line-dedup-min-df", type=int, default=None,
                   help="RefinedWeb line-wise boilerplate removal before "
                   "exact dedup: lines recurring across >= N docs are cut")
    p.add_argument("--ppl-keep-buckets", default=None,
                   help="CCNet perplexity filter after dedup: keep only "
                   "these buckets, e.g. '0,1' (0 = most stereotypical)")
    p.add_argument("--ppl-n-buckets", type=int, default=3)
    p.add_argument("--ppl-scorer", default="unigram",
                   choices=("unigram", "bigram", "kneser_ney"),
                   help="LM behind the perplexity filter: corpus-unigram, "
                   "Stupid Backoff bigram, or interpolated Kneser-Ney "
                   "bigram")
    p.add_argument("--ppl-model", default=None,
                   help="reference-corpus parquet for the bigram scorer "
                   "(CCNet shape: train on trusted text, score the "
                   "crawl); default scores against the corpus itself")
    p.add_argument("--quality-classifier-coeffs", default=None,
                   help="coefficient parquet (bucket, weight; intercept at "
                   "bucket=-1) from qualityclf.train_logreg: score every "
                   "doc after dedup and keep score >= threshold")
    p.add_argument("--quality-threshold", type=float, default=0.5)
    p.add_argument("--bpe-merges", type=int, default=None,
                   help="learn a BPE vocab of N merges on the sampled "
                   "corpus (persisted as the bpe_vocab stage) and pack "
                   "in tokenizer subword counts instead of whitespace "
                   "tokens")
    p.add_argument("--unigram-vocab", type=int, default=None,
                   help="train a Unigram-LM tokenizer of this vocab size "
                        "on the sampled corpus (unigram_vocab stage) and "
                        "pack in its subword counts; mutually exclusive "
                        "with --bpe-merges")
    p.add_argument("--bpe-byte-level", action="store_true",
                   help="with --bpe-merges: train/segment BYTE-level "
                   "BPE over GPT-2 pre-tokens (case/space-preserving, "
                   "no OOV) instead of char-level over \\S+ words")
    p.add_argument("--quality-classifier-buckets", type=int,
                   default=1 << 15,
                   help="feature-hash bucket count; must match training")
    p.add_argument("--mixture-upsample", action="store_true",
                   help="repetition regime for --mixture: scarce strata "
                   "repeat (per-row repeat_ix; packing keys on doc_id + "
                   "repeat_ix); default budget = the corpus's token mass")
    p.add_argument("--dsir-target", default=None,
                   help="target-corpus parquet (text column): DSIR "
                   "importance resampling as the sampling stage — keep "
                   "the --dsir-k docs most target-like by hashed-n-gram "
                   "likelihood ratio (Gumbel top-k, seeded by "
                   "--sample-salt); target content joins the resume "
                   "signature; mutually exclusive with --mixture and "
                   "--sample-rates")
    p.add_argument("--dsir-k", type=int, default=None,
                   help="number of documents DSIR keeps (required with "
                   "--dsir-target)")
    p.add_argument("--dsir-buckets", type=int, default=10_000,
                   help="hashed n-gram bucket count for the DSIR model")
    p.add_argument("--dsir-alpha", type=float, default=1.0,
                   help="additive smoothing for the DSIR bucket models; "
                   "keep alpha*buckets well under the target's gram "
                   "count or the ratio degenerates (dsir docstring)")
    p.add_argument("--dsir-length-normalize", action="store_true",
                   help="score by mean per-gram log ratio instead of the "
                   "paper's raw sum — for unchunked mixed-length corpora")
    p.add_argument("--mixture-temperature", type=float, default=None,
                   help="temperature-scaled domain mixing: proportions ~ "
                   "(token share)^(1/T), then the mixture sampler; "
                   "composes with --target-tokens; mutually exclusive "
                   "with the other sampling policies")
    p.add_argument("--unimax-budget", type=int, default=None,
                   help="UniMax water-filled token budget: as uniform as "
                   "possible subject to --unimax-epochs per stratum; "
                   "output carries repeat_ix; mutually exclusive with "
                   "the other sampling policies")
    p.add_argument("--unimax-epochs", type=float, default=1.0,
                   help="per-stratum epoch cap for --unimax-budget")
    p.add_argument("--latest-capture", action="store_true",
                   help="consolidate a multi-capture input to the newest "
                   "capture per URL (weburl.latest_capture) as the very "
                   "first stage; requires url + warc_ts columns")
    p.add_argument("--delta-old", default=None, metavar="PARQUET",
                   help="previous snapshot (url + fingerprint, md5(text) "
                   "contract, or url + text): keep only NEW or CHANGED "
                   "URLs (weburl.keep_new_or_changed) — incremental "
                   "recrawl ingest; snapshot content in the resume "
                   "signature")
    p.add_argument("--holdout-frac", type=float, default=None,
                   help="carve a leakage-safe validation set before the "
                   "sampling slot: this fraction of GROUPS (by hash "
                   "mass) goes to a holdout_val table; sampling/packing "
                   "see only the train side (corpus.holdout_split)")
    p.add_argument("--holdout-group", default="source",
                   help="group column for the holdout assignment — all "
                   "docs of a group land on one side (default: source)")
    p.add_argument("--main-content", action="store_true",
                   help="with --input-format warc: extract the MAIN "
                        "content of each page (textops."
                        "main_content_blocks block-level link-density "
                        "heuristic) instead of all visible text — nav "
                        "bars, footers, and link boxes never become "
                        "document text")
    p.add_argument("--export-warc", type=int, default=None, metavar="N_FILES",
                   help="after packing, export the sampled corpus as N "
                   "deterministic WARC files under <warehouse>/warc_export "
                   "(sources.write_warc; crawl-tool interchange)")
    p.add_argument("--respect-noindex", action="store_true",
                   help="WARC input only: drop pages carrying a meta "
                   "robots noindex directive at the ingest boundary "
                   "(weburl.NOINDEX_RE) — the publisher opt-out")
    p.add_argument("--quality-sample-k", type=int, default=None,
                   help="soft quality selection as the sampling policy "
                   "(requires --quality-classifier-coeffs): classifier "
                   "sigmoid score becomes the sampling weight; keep K "
                   "docs without replacement (corpus.weighted_sample_k); "
                   "replaces the hard-threshold quality_filtered stage")
    p.add_argument("--pack-whole-docs", action="store_true",
                   help="pack with whole-document next-fit bins "
                   "(corpus.pack_bins: no doc ever splits across "
                   "sequences; over-length docs flagged truncated) "
                   "instead of concat-chunk")
    p.add_argument("--export-jsonl", type=int, default=None,
                   metavar="N_FILES",
                   help="after packing, export the sampled corpus as N "
                   "deterministic JSONL.gz files under "
                   "<warehouse>/jsonl_export (sources.write_jsonl; "
                   "dataset-release interchange, byte-identical reruns)")
    args = p.parse_args(argv)
    if (args.dsir_target is None) != (args.dsir_k is None):
        p.error("--dsir-target and --dsir-k go together")
    if args.dsir_target and (args.mixture or args.sample_rates):
        p.error("--dsir-target is mutually exclusive with --mixture "
                "and --sample-rates")
    n_pol = sum(bool(x) for x in (
        args.sample_rates, args.mixture, args.dsir_target,
        args.mixture_temperature, args.unimax_budget,
        args.quality_sample_k,
    ))
    if n_pol > 1:
        p.error("--sample-rates/--mixture/--dsir-target/"
                "--mixture-temperature/--unimax-budget/"
                "--quality-sample-k are mutually "
                "exclusive (one sampling policy per run)")
    if args.quality_sample_k and not args.quality_classifier_coeffs:
        p.error("--quality-sample-k requires --quality-classifier-coeffs")
    if args.main_content and args.input_format != "warc":
        p.error("--main-content applies to --input-format warc only "
                "(other formats carry text, not page HTML)")
    if args.respect_noindex and args.input_format != "warc":
        p.error("--respect-noindex applies to --input-format warc only "
                "(parquet/jsonl corpora carry no html)")
    if args.unimax_epochs != 1.0 and not args.unimax_budget:
        p.error("--unimax-epochs requires --unimax-budget")
    if args.semantic_dedup_embeddings and args.semantic_dedup_cells:
        p.error("--semantic-dedup-embeddings and --semantic-dedup-cells "
                "are mutually exclusive")
    if args.mixture and args.sample_rates:
        p.error("--mixture and --sample-rates are mutually exclusive")
    if args.mixture_upsample and not args.mixture:
        p.error("--mixture-upsample requires --mixture")
    if args.fuzzy_decontaminate_threshold is not None and not args.eval_set:
        p.error("--fuzzy-decontaminate-threshold requires --eval-set")
    sample_rates = None
    if args.sample_rates:
        sample_rates = {
            k: float(v)
            for k, v in (kv.split("=", 1) for kv in args.sample_rates.split(","))
        }

    spark = get_spark("slowspark-curate", master=args.master)
    try:
        if args.input_format == "warc":
            from slowspark.sources import read_warc
            from slowspark.textops import language_id

            recs = read_warc(spark, args.input).filter(
                F.col("warc_type") == "response"
            )
            if args.respect_noindex:
                # publisher opt-out honored at the ingest boundary: a
                # noindexed page never even becomes a document row
                from slowspark.weburl import NOINDEX_RE

                recs = recs.filter(
                    ~F.coalesce(
                        F.decode("payload", "UTF-8").rlike(NOINDEX_RE),
                        F.lit(False),
                    )
                )
            if args.main_content:
                from slowspark.textops import main_content_blocks

                recs = main_content_blocks(recs, html_col="payload")
                text_expr = F.col("main_text")
            else:
                text_expr = F.decode("payload", "UTF-8")
            docs = language_id(
                recs.select(
                    # doc_id is per CAPTURE, not per URL: multi-snapshot
                    # crawls normally carry several responses for the same
                    # URL, and a url-only hash would silently collide the
                    # md5(doc_id) samplers and (doc_id, repeat_ix) packing
                    # keys downstream (ADVICE r7)
                    F.xxhash64("url", F.col("warc_ts").cast("string"))
                    .alias("doc_id"),
                    "url",
                    F.col("warc_ts"),
                    text_expr.alias("text"),
                )
            ).withColumnRenamed("lang_pred", "lang").drop("lang_score")
            if not args.latest_capture:
                # same url AND same warc_ts is genuinely ambiguous input —
                # fail loudly with the flag that consolidates captures
                dup = (
                    docs.groupBy("doc_id").count()
                    .filter(F.col("count") > 1).limit(1).collect()
                )
                if dup:
                    raise SystemExit(
                        "curate: duplicate doc_id after WARC ingest (same "
                        "url + warc_ts captured more than once). Pass "
                        "--latest-capture to consolidate captures per URL, "
                        "or dedupe the WARC input."
                    )
        elif args.input_format == "jsonl":
            from slowspark.sources import read_jsonl

            docs = read_jsonl(
                spark, args.input, required_cols=("doc_id", "text")
            )
            if "lang" not in docs.columns:
                from slowspark.textops import language_id

                docs = language_id(docs).withColumnRenamed(
                    "lang_pred", "lang"
                ).drop("lang_score")
        else:
            docs = spark.read.parquet(args.input)
        eval_df = spark.read.parquet(args.eval_set) if args.eval_set else None
        emb_df = (
            spark.read.parquet(args.semantic_dedup_embeddings)
            if args.semantic_dedup_embeddings else None
        )
        cells_df = (
            spark.read.parquet(args.semantic_dedup_cells)
            if args.semantic_dedup_cells else None
        )
        qc_df = (
            spark.read.parquet(args.quality_classifier_coeffs)
            if args.quality_classifier_coeffs else None
        )
        tables = run_curation(
            spark, docs, args.warehouse,
            f"path:{args.input}:{args.input_format}"
            f":ni={int(args.respect_noindex)}"
            f":mc={int(args.main_content)}",
            min_words=args.min_words,
            passage_words=args.passage_words,
            max_docs_per_passage=args.max_docs_per_passage,
            sample_rate=args.sample_rate,
            sample_rates=sample_rates,
            sample_salt=args.sample_salt,
            seq_len=args.seq_len,
            eval_df=eval_df,
            decontaminate_ngram=args.decontaminate_ngram,
            fuzzy_decontaminate_threshold=args.fuzzy_decontaminate_threshold,
            fuzzy_decontaminate_ngram=args.fuzzy_decontaminate_ngram,
            langs=args.langs.split(",") if args.langs else None,
            scrub_pii=args.scrub_pii,
            substring_dedup_n=args.substring_dedup_n,
            substring_dedup_chars=args.substring_dedup_chars,
            embeddings_df=emb_df,
            semantic_cells_df=cells_df,
            semantic_n_clusters=args.semantic_n_clusters,
            semantic_threshold=args.semantic_threshold,
            mixture={
                k: float(v)
                for k, v in (kv.split("=", 1)
                             for kv in args.mixture.split(","))
            } if args.mixture else None,
            target_tokens=args.target_tokens,
            mixture_upsample=args.mixture_upsample,
            url_dedup=args.url_dedup,
            badwords=args.badwords.split(",") if args.badwords else None,
            gopher_repetition=args.gopher_repetition,
            line_dedup_min_df=args.line_dedup_min_df,
            domain_quality_threshold=args.domain_quality_threshold,
            domain_col=args.domain_col,
            max_docs_per_domain=args.max_docs_per_domain,
            ppl_keep_buckets=(
                [int(b) for b in args.ppl_keep_buckets.split(",")]
                if args.ppl_keep_buckets else None
            ),
            ppl_n_buckets=args.ppl_n_buckets,
            ppl_scorer=args.ppl_scorer,
            ppl_model_df=(
                spark.read.parquet(args.ppl_model) if args.ppl_model else None
            ),
            quality_coeffs_df=qc_df,
            quality_threshold=args.quality_threshold,
            quality_n_buckets=args.quality_classifier_buckets,
            bpe_merges_n=args.bpe_merges,
            bpe_byte_level=args.bpe_byte_level,
            unigram_vocab=args.unigram_vocab,
            dsir_target_df=(
                spark.read.parquet(args.dsir_target)
                if args.dsir_target else None
            ),
            dsir_k=args.dsir_k,
            dsir_buckets=args.dsir_buckets,
            dsir_alpha=args.dsir_alpha,
            dsir_length_normalize=args.dsir_length_normalize,
            mixture_temperature=args.mixture_temperature,
            unimax_budget=args.unimax_budget,
            unimax_epochs=args.unimax_epochs,
            holdout_frac=args.holdout_frac,
            holdout_group=args.holdout_group,
            latest_capture=args.latest_capture,
            delta_old_df=(
                spark.read.parquet(args.delta_old)
                if args.delta_old else None
            ),
            pack_whole_docs=args.pack_whole_docs,
            quality_sample_k=args.quality_sample_k,
        )
        if args.export_warc:
            from slowspark.sources import write_warc

            sampled = tables["sampled"]
            if "url" not in sampled.columns:
                sampled = sampled.withColumn(
                    "url",
                    F.concat(F.lit("urn:slowspark:doc:"),
                             F.col("doc_id").cast("string")),
                )
            warc_manifest = write_warc(
                sampled.select(
                    "url", F.encode("text", "UTF-8").alias("payload"),
                    *(c for c in ("lang", "doc_id") if c in sampled.columns),
                ).dropDuplicates(["url"]),
                os.path.join(args.warehouse, "warc_export"),
                n_files=args.export_warc,
                header_cols=tuple(
                    c for c in ("lang", "doc_id") if c in sampled.columns
                ),
            )
        else:
            warc_manifest = None
        if args.export_jsonl:
            from slowspark.sources import write_jsonl

            sampled = tables["sampled"]
            jsonl_manifest = write_jsonl(
                sampled.select(*(
                    c for c, t in sampled.dtypes if t != "binary"
                )),
                os.path.join(args.warehouse, "jsonl_export"),
                n_files=args.export_jsonl,
            )
        else:
            jsonl_manifest = None
        audit = tables["filter_audit"].collect()[0].asDict()
        stages = {
            name: tables[name].count()
            for name in ("latest_captured", "delta_ingested",
                         "url_deduped", "lang_filtered", "filtered",
                         "badword_filtered", "gopher_filtered",
                         "domain_filtered", "domain_capped",
                         "line_deduped", "deduped_exact",
                         "deduped_near", "semantic_deduped",
                         "substring_deduped", "substring_char_deduped",
                         "ppl_filtered",
                         "quality_filtered", "scrubbed",
                         "pii_scrubbed", "decontaminated",
                         "fuzzy_decontaminated", "holdout_val",
                         "holdout_train", "sampled", "packed")
            if name in tables
        }
        if args.pack_whole_docs:
            n_seq = tables["packed"].select("shard", "bin_ix").distinct() \
                .count()
        else:
            n_seq = tables["packed"].agg(
                (F.max("seq_id") + 1).alias("n")
            ).collect()[0]["n"]
        summary = {
            "filter_audit": audit,
            "stage_rows": stages,
            "n_sequences": int(n_seq or 0),
        }
        if warc_manifest is not None:
            summary["warc_export"] = {
                "n_files": len(warc_manifest),
                "n_records": sum(m["n_records"] for m in warc_manifest),
                "n_bytes": sum(m["n_bytes"] for m in warc_manifest),
            }
        if jsonl_manifest is not None:
            summary["jsonl_export"] = {
                "n_files": len(jsonl_manifest),
                "n_records": sum(m["n_records"] for m in jsonl_manifest),
                "n_bytes": sum(m["n_bytes"] for m in jsonl_manifest),
            }
        print(json.dumps(summary))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
