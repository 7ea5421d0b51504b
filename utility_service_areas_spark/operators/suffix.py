"""Distributed suffix-rank construction by prefix doubling, and exact
longest-repeated-substring (LRS) statistics over a tokenized corpus.

The Lee et al. "Deduplicating Training Data Makes Language Models
Better" (2022) exact-substring method builds a suffix array over the
corpus and reads repeats off adjacent-suffix LCPs. This module is that
algorithm re-expressed in DataFrame algebra (Karp-Miller-Rosenberg
prefix doubling — the sort-based construction every distributed
suffix-array paper uses, e.g. Flick & Aluru 2015):

  rank_0(p)   = dense rank of the token at position p
  rank_k(p)   = dense rank of (rank_{k-1}(p), rank_{k-1}(p + 2^{k-1}))
                with sentinel 0 past the document end
  => rank_K is the lexicographic rank of the (truncated at 2^K)
     suffix starting at p, equal ranks <=> equal suffixes.

maxrep(p) — the length of the longest substring starting at p that
occurs >= 2 times in the corpus (overlaps allowed, cross- or
intra-document) — is then exact via the suffix-array property that the
maximal LCP of a suffix is achieved against one of its ORDER-adjacent
suffixes: lcp(neighbor pairs) by binary descent over the retained
rank_k tables (extend by 2^k iff both blocks are fully in-document and
their rank_k agree — any shared prefix decomposes into full binary
blocks, so the descent is exact to token granularity).

Scale posture (100 TB):
- No global-window ranking anywhere. Dense ranks are computed with a
  window PER ORDER-ALIGNED BAND (the banding key is a monotone
  function of the sort key, so equal keys can't straddle bands) plus
  collected per-band distinct counts -> cumulative offsets. Driver
  state is <= n_bands rows per round (256 here) — the same bounded
  pattern as the BPE argmax and k-means centroid collects.
- Every shuffle is keyed (doc, position) or (band); pair frames are
  rank-count sized; rank tables are lineage_cut per level because each
  is consumed by the next doubling round AND by the LCP descent
  (Catalyst does not reuse identical subtrees).
- Rounds are FIXED at K (no data-dependent early stop) so the DuckDB
  oracle can replay the construction as an unrolled CTE chain,
  bit-for-bit: dense ranks are integers, the descent is integer
  comparisons — no float crosses the engines.

Resolution cap: rank_K distinguishes suffixes up to 2^K tokens, so
repeats are exact for documents <= 2^K tokens and saturate at 2^K on
longer ones (the substrate maxes out far below; production picks K
from max document length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from utility_service_areas_spark.operators.dedup import lineage_cut

LRS_K = 8  # rank levels 0..K; suffix resolution 2^K = 256 tokens
_BANDS = 256  # dense-rank banding width (driver state per round)


def _dense_rank_banded(
    df: DataFrame, key_cols: list[str], band: F.Column
) -> tuple[DataFrame, int]:
    """Exact distributed dense_rank over ``key_cols``.

    ``band`` must be ORDER-ALIGNED with the key: monotone non-
    decreasing along the key's sort order and constant on equal keys
    (a prefix of the sort key). Then dense_rank factorizes into a
    per-band window rank plus the cumulative count of distinct keys in
    lower bands — the window shuffles by band (bounded partitions,
    never a single reducer) and the offsets are a <= _BANDS-row
    driver collect. Returns (frame + 'rk' column, total distinct keys).
    """
    local = lineage_cut(
        df.withColumn("_band", band).withColumn(
            "_lrk",
            F.dense_rank().over(
                Window.partitionBy("_band").orderBy(*key_cols)
            ),
        )
    )
    # max local dense rank == number of distinct keys in the band
    stats = (
        local.groupBy("_band").agg(F.max("_lrk").alias("_n")).collect()
    )
    off = 0
    offsets: dict[int, int] = {}
    for row in sorted(stats, key=lambda r: r._band):
        offsets[row._band] = off
        off += row._n
    if not offsets:  # empty input
        return local.withColumn("rk", F.lit(0).cast("long")).drop(
            "_band", "_lrk"
        ), 0
    # One pre-rendered map literal instead of <= 512 F.lit() py4j
    # round-trips per round (r18 batch-F treatment; <= _BANDS entries,
    # values are plain longs).
    entries = ", ".join(f"{b}L, {o}L" for b, o in offsets.items())
    out = local.withColumn(
        "rk",
        F.expr(f"CAST(map({entries})[_band] + _lrk AS BIGINT)"),
    ).drop("_band", "_lrk")
    return out, off


# public alias: the banded dense rank is a general scale-safe device
# (operators/ann.py uses it to index arbitrary id spaces)
dense_rank_banded = _dense_rank_banded


def build_suffix_ranks(
    positions: DataFrame, k_levels: int = LRS_K
) -> list[DataFrame]:
    """``positions``: (doc_id, i, dl, h) with i the 1-based token
    index, DENSE per document (every i in 1..dl present exactly once —
    the _tok_frame contract; the doubling rounds read the shifted rank
    as a lead() over position order, which requires it), dl the
    document token count, h an order-key string for the single token
    (md5 hex here — ASCII orders identically in every engine).
    Returns rank tables [rank_0 .. rank_K], each (doc_id, i, dl, rk),
    lineage_cut (each level feeds the next round AND the LCP descent).
    """
    band0 = F.conv(F.substring("h", 1, 2), 16, 10).cast("long")
    # _dense_rank_banded already lineage_cut its frame; the select is a
    # projection over the cached cut — no second materialization needed
    r0, total = _dense_rank_banded(positions, ["h"], band0)
    ranks = [r0.select("doc_id", "i", "dl", "rk")]
    shift_w = Window.partitionBy("doc_id").orderBy("i")
    for k in range(1, k_levels + 1):
        half = 1 << (k - 1)
        prev = ranks[k - 1]
        # rank_{k-1}(p + 2^{k-1}) is a LEAD over the position order:
        # positions are dense 1..dl per document (the _tok_frame
        # contract), so the row `half` steps later in (doc_id, i)
        # order IS position i+half, and lead() returns NULL past the
        # document end — exactly the old shifted self-join's
        # left-join + coalesce(0) semantics, minus one corpus-wide
        # Exchange+Sort per doubling round (the join shuffled BOTH
        # sides on the position key; the window shuffles once on
        # doc_id — guide §2.4, the same treatment batch B gave the CC
        # loop). Equivalence pinned by
        # test_suffix_lead_matches_join_reference.
        paired = prev.select(
            "doc_id",
            "i",
            "dl",
            F.col("rk").alias("r1"),
            F.coalesce(F.lead("rk", half).over(shift_w), F.lit(0))
            .cast("long")
            .alias("r2"),
        )
        # monotone in r1 (the leading sort key), constant on equal keys
        band = F.expr(f"CAST(r1 * {_BANDS} AS BIGINT) div {total + 1}")
        ranked, total = _dense_rank_banded(paired, ["r1", "r2"], band)
        ranks.append(ranked.select("doc_id", "i", "dl", "rk"))
    return ranks


def neighbor_lcp(
    ranks: list[DataFrame], k_levels: int = LRS_K
) -> DataFrame:
    """LCP between order-adjacent suffix groups of the final rank
    table: one representative per rank (equal ranks are equal
    suffixes, so any member carries the group's content), adjacent
    reps paired by rank arithmetic (rk+1 == rk, never an ordered
    window), then the binary descent. Returns (rk, nbr_lcp): the max
    LCP a member of rank-group rk has with either adjacent group."""
    final = ranks[k_levels]
    wrep = Window.partitionBy("rk").orderBy("doc_id", "i")
    reps = (
        final.withColumn("_rn", F.row_number().over(wrep))
        .filter(F.col("_rn") == 1)
        .select("rk", "doc_id", "i", "dl")
    )
    reps = lineage_cut(reps)  # consumed twice (both sides of the pair)
    pairs = (
        reps.alias("a")
        .join(
            reps.alias("b"),
            F.col("b.rk") == F.col("a.rk") + 1,
        )
        .select(
            F.col("a.rk").alias("rka"),
            F.col("a.doc_id").alias("da"),
            F.col("a.i").alias("ia"),
            F.col("a.dl").alias("dla"),
            F.col("b.doc_id").alias("db"),
            F.col("b.i").alias("ib"),
            F.col("b.dl").alias("dlb"),
            F.lit(0).cast("long").alias("off"),
        )
    )
    for k in range(k_levels, -1, -1):
        step = 1 << k
        lk = ranks[k]
        ka = lk.select(
            F.col("doc_id").alias("_kda"),
            F.col("i").alias("_kia"),
            F.col("rk").alias("_rka"),
        )
        kb = lk.select(
            F.col("doc_id").alias("_kdb"),
            F.col("i").alias("_kib"),
            F.col("rk").alias("_rkb"),
        )
        pairs = (
            pairs.withColumn("_ja", F.col("ia") + F.col("off"))
            .withColumn("_jb", F.col("ib") + F.col("off"))
            .join(
                ka,
                (F.col("da") == F.col("_kda"))
                & (F.col("_ja") == F.col("_kia")),
                "left",
            )
            .join(
                kb,
                (F.col("db") == F.col("_kdb"))
                & (F.col("_jb") == F.col("_kib")),
                "left",
            )
        )
        ok = (
            F.col("_rka").isNotNull()
            & F.col("_rkb").isNotNull()
            & (F.col("_ja") + (step - 1) <= F.col("dla"))
            & (F.col("_jb") + (step - 1) <= F.col("dlb"))
            & (F.col("_rka") == F.col("_rkb"))
        )
        pairs = pairs.withColumn(
            "off", F.when(ok, F.col("off") + step).otherwise(F.col("off"))
        ).drop("_kda", "_kia", "_rka", "_kdb", "_kib", "_rkb", "_ja", "_jb")
        # single-consumer chain: a cut here is pure job overhead, but
        # the plan deepens 2 joins per level — cut every 3rd level to
        # bound Catalyst analysis cost without 9 materializations
        if k % 3 == 0:
            pairs = lineage_cut(pairs)
    # a pair's LCP bounds BOTH groups it touches
    both = pairs.select(F.col("rka").alias("rk"), F.col("off").alias("lcp")).unionAll(
        pairs.select((F.col("rka") + 1).alias("rk"), F.col("off").alias("lcp"))
    )
    return both.groupBy("rk").agg(F.max("lcp").cast("long").alias("nbr_lcp"))


def _tok_frame(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, i, t): 1-based token positions of the whole corpus."""
    from utility_service_areas_spark.functions.textops import tokens

    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("i0", "t"),
    ).select("doc_id", (F.col("i0") + 1).cast("long").alias("i"), "t")


def per_position_maxrep(
    tok: DataFrame, k_levels: int = LRS_K
) -> DataFrame:
    """(doc_id, i, dl, maxrep) for every corpus position: maxrep is
    the exact token length of the longest substring starting at (doc,
    i) occurring >= 2 times anywhere (overlaps allowed), capped at
    2^k_levels (rank_K equality certifies only that many tokens)."""
    pos = tok.withColumn(
        "dl", F.count(F.lit(1)).over(Window.partitionBy("doc_id")).cast("long")
    ).select("doc_id", "i", "dl", F.md5("t").alias("h"))
    ranks = build_suffix_ranks(pos, k_levels)
    final = ranks[k_levels]
    grp = final.groupBy("rk").agg(F.count(F.lit(1)).alias("gs"))
    nbr = neighbor_lcp(ranks, k_levels)
    return (
        final.join(grp, "rk")
        .join(nbr, "rk", "left")
        .select(
            "doc_id",
            "i",
            "dl",
            F.greatest(
                F.coalesce(F.col("nbr_lcp"), F.lit(0)),
                F.when(
                    F.col("gs") >= 2,
                    F.least(
                        F.col("dl") - F.col("i") + 1,
                        F.lit(1 << k_levels),
                    ),
                ).otherwise(F.lit(0)),
            )
            .cast("long")
            .alias("maxrep"),
        )
    )


def doc_repeat_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_rep: int = 8,
    k_levels: int = LRS_K,
) -> DataFrame:
    """Per-document exact repeated-substring statistics:
    (doc_id, n_positions, max_rep_len, n_pos_rep_ge{min_rep}).

    Saturation: rank_K equality certifies only the first 2^K tokens,
    so the equal-rank (full-suffix-repeat) branch is CAPPED at 2^K —
    on documents longer than 2^K the stat saturates there instead of
    overclaiming the whole remaining suffix."""
    tok = _tok_frame(docs, text_col, id_col)
    per_pos = per_position_maxrep(tok, k_levels)
    return per_pos.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_positions"),
        F.max("maxrep").cast("long").alias("max_rep_len"),
        F.sum(F.when(F.col("maxrep") >= min_rep, 1).otherwise(0))
        .cast("long")
        .alias(f"n_pos_rep_ge{min_rep}"),
    )


def splice_repeats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_rep: int = 8,
    k_levels: int = LRS_K,
) -> DataFrame:
    """Exact-substring dedup REMOVAL (Lee et al. 2022 §'ExactSubstr'):
    splice out every token covered by some repeated span of >= min_rep
    tokens (a span starting at p with maxrep(p) >= min_rep covers
    positions [p, p + maxrep(p) - 1]; both/all copies are removed —
    the paper's documented semantics) and re-emit the cleaned text.

    Returns (doc_id, n_tokens, n_removed, cleaned_text) for EVERY
    input document (docs whose text is entirely repeats come back with
    cleaned_text = '').

    Coverage is a per-document running max over span ends — a position
    j is covered iff max over p <= j of (p + maxrep(p) - 1 when
    maxrep(p) >= min_rep) reaches j. That is one ordered window per
    document (documents are bounded-length; no corpus-global sort),
    then one keyed join back to the token stream and one groupBy to
    reassemble text — everything downstream of the rank build is
    corpus-token-sized with keyed shuffles only.

    Exactness: maxrep is integer-exact (suffix ranks), coverage is
    integer comparisons, and the rebuilt text is a deterministic
    order-by-position join of the kept tokens — the DuckDB oracle
    replays all of it bit-for-bit (string_agg ORDER BY i)."""
    tok = lineage_cut(_tok_frame(docs, text_col, id_col))
    per_pos = per_position_maxrep(tok, k_levels)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    reach = per_pos.withColumn(
        "reach",
        F.max(
            F.when(
                F.col("maxrep") >= min_rep,
                F.col("i") + F.col("maxrep") - 1,
            )
        ).over(w),
    )
    flagged = reach.withColumn(
        "cut",
        F.when(
            F.col("reach").isNotNull() & (F.col("reach") >= F.col("i")), 1
        )
        .otherwise(0)
        .cast("int"),
    ).join(tok, ["doc_id", "i"])
    per_doc = flagged.groupBy("doc_id").agg(
        F.max("dl").cast("long").alias("n_tokens"),
        F.sum("cut").cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("cut") == 0, F.struct("i", "t")
                        )  # NULL (= removed) rows are skipped by collect_list
                    )
                ),
                lambda s: s["t"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )
