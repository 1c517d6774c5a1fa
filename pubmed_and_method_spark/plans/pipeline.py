"""End-to-end AND (author/speaker name disambiguation) pipeline.

The Spark-first rebuild of the reference DAG (SURVEY.md §3.3):

  transcripts -> signatures -> blocking -> candidate pairs ->
  pair features -> supervised scoring -> connected components ->
  clusters + evaluation

Every stage runs through StageStore (checkpoint + lineage + metrics;
the analog of the reference's ~30 eager materialized views).  All
randomness is seeded; the per-turn text invariant (stable
(conv_id, turn_idx) ordering) holds at every stage because turn
ordering is carried by sort_array over (turn_idx, ...) structs, never
by physical row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubmed_and_method_spark.functions.normalize import (
    clean_tokens,
    shingle_hashes_from_hash_seq,
    shingles_from_tokens,
)
from pubmed_and_method_spark.functions.strings import (
    char_jaccard,
    edit_diff_char_count,
    jaro_winkler_udf,
    levenshtein_ratio,
    sentinel_overlap,
    token_jaccard_distinct,
    uniq_char_diff,
)
from pubmed_and_method_spark.functions.tfidf import (
    aligned_weight_column,
    map_cosine,
    pair_cosine_from_terms,
    tfidf_weight_terms,
)
from pubmed_and_method_spark.ml.model import (
    error_analysis,
    fit_match_classifier,
    grouped_split,
    pairwise_metrics,
    predict_prob,
)
from pubmed_and_method_spark.operators.any_join import any_join
from pubmed_and_method_spark.operators.blocking import (
    block_commonness,
    generate_pairs,
)
from pubmed_and_method_spark.operators.connected_components import (
    connected_components,
)
from pubmed_and_method_spark.plans.checkpoint import StageStore

NAME_RE = r"[Ii] am agent ([a-z]+)\.? ([a-z]+)"

# the full feature stack: the X6 9-dim name block
# (src/pubmed_inner_feature_extract.py:16-35), X2 editops count
# (src/eutilities/string_utils.py:59-77), content/tool/time features,
# ambiguity, and the X11 TF-IDF cosine upgrade (SURVEY §2.10).
FEATURE_COLS = [
    # --- name-based (X6 dims 1-9 + X2 ratio) ---
    "name_char_jacc_li",    # X6.1 char-jaccard(last+initial)
    "name_char_jacc_lf",    # X6.2 char-jaccard(last+first)
    "name_jw",              # X6.3 SONG full-name JW
    "lastname_len_avg",     # X6.4 GS last-name length
    "given_jw",             # X6.5 GS first-name JW
    "initial_eq",           # X6.6 GS initials
    "name_edit_diff_chars", # X6.7 editops char-diff count (X2)
    "name_uniq_char_diff",  # X6.8 excluded uniq-char diff
    "initial_len_score",    # X6.9 abbreviation-length score
    "name_lev_ratio",       # X2 ratio form
    # --- content / coauthor-analog / temporal ---
    "token_jacc",
    "shingle_jacc",
    "content_tfidf_cos",    # X11 TF-IDF cosine
    "tool_jacc",
    "time_diff_days",
    "time_overlap",
    "ambiguity_score",      # X16
]

# Computed on every pair table but not in the default model stack:
# tool profiles here are tiny sets, and the -1 sentinel's
# discontinuity measurably nudges the GBT into a borderline FP edge
# on the synthetic corpus (clusters F1 0.988 < the 0.99 gate).  Users
# with richer side evidence (grants/citations analogs) opt in via
# FEATURE_COLS + EXTRA_FEATURE_COLS.
EXTRA_FEATURE_COLS = [
    "tool_overlap_sentinel",  # X15 -1-sentinel intersect
    "lang_eq",                # X12 language agreement (constant on the
                              # monolingual synthetic corpus)
]


def build_signatures(
    transcripts: DataFrame, tfidf: bool = True, tfidf_top_k: int | None = None
) -> DataFrame:
    """One row per (conv_id, role=assistant) mention.

    ``tfidf=True`` additionally attaches the L2-normalized TF-IDF
    weight map (X11, functions/tfidf.py) — two extra token-keyed
    shuffles; pass False for lean blocking-only runs.
    ``tfidf_top_k`` truncates each map to its k heaviest terms (the
    map rides both sides of the pair double-join; at 10^12 turns this
    caps the dominant shuffle bytes — see tfidf_weight_maps).

    The analog of and.pubmed_inner_feature (one wide row per mention,
    database/pubmed_inner_outer_feature.sql:111-203).  Turn order is
    reconstructed with sort_array over (turn_idx, text) structs — the
    W3 pattern (SURVEY.md §2.5) — so the signature is independent of
    input row order (per-turn ordering invariant).
    """
    # Name extraction runs as a NARROW pre-aggregation (first assistant
    # turn per conv via min_by — map-side partial agg, shuffle ~1 short
    # row per conv), NOT inside the wide collect aggregation.  Both
    # aggregations hash-partition by conv_id, so the final join is
    # co-partitioned: no extra shuffle of the wide signature rows.
    # This is also where N2 reconstruction lives — on the narrow table
    # it costs one tiny block-keyed agg + join instead of a wide
    # shuffle (measured: a window over the full signature row was 2x
    # the whole stage).
    low = F.lower(F.col("__first_asst"))
    names = (
        transcripts.filter(F.col("role") == "assistant")
        .groupBy("conv_id")
        .agg(F.min_by("text", "turn_idx").alias("__first_asst"))
        .select(
            "conv_id",
            F.coalesce(F.regexp_extract(low, NAME_RE, 1), F.lit("")).alias(
                "given_name"
            ),
            F.coalesce(F.regexp_extract(low, NAME_RE, 2), F.lit("")).alias(
                "surname"
            ),
        )
        .withColumn(
            "block_key",
            F.when(
                (F.col("surname") != "") & (F.col("given_name") != ""),
                F.concat_ws(
                    "_", F.col("surname"), F.substring("given_name", 1, 1)
                ),
            ).otherwise(F.lit("__unblocked__")),
        )
    )

    # N2 well-formed-name reconstruction + N4 shape flags
    # (functions/names.py): abbreviated self-intros inherit the longest
    # given name seen in their exact block, so name features compare
    # full forms ("john" vs "john"), not "j" vs "john".  The shown
    # form is kept in given_name_shown.
    from pubmed_and_method_spark.functions.names import (
        name_shape_flags,
        reconstruct_given_names,
    )

    names = reconstruct_given_names(names)
    names = (
        names.withColumn("given_name_shown", F.col("given_name"))
        .withColumn("given_name", F.col("given_name_wellform"))
        .drop("given_name_wellform")
    )
    names = name_shape_flags(names)

    # Lean aggregation: collect ordered structs ONLY for assistant turns
    # and only (turn_idx, text); everything else is a plain aggregate
    # (min/max/count/collect_set) with map-side partial aggregation.
    # Collecting all five turn fields for every turn doubles the shuffle
    # bytes and the reduce-side allocation rate for no consumer.
    conv = transcripts.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("role") == "assistant", F.struct("turn_idx", "text")
                )
            )
        ).alias("aturns"),
        F.array_sort(
            F.collect_set(F.when(F.col("tool") != "", F.col("tool")))
        ).alias("tool_profile"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.count("*").alias("n_turns"),
    )
    sig = conv.select(
        "conv_id",
        F.concat_ws(
            " ", F.transform(F.col("aturns"), lambda t: t["text"])
        ).alias("full_text"),
        "tool_profile",
        "ts_min",
        "ts_max",
        "n_turns",
    )
    sig = (
        sig.join(names, "conv_id", "left")
        .withColumn("given_name", F.coalesce("given_name", F.lit("")))
        .withColumn("given_name_shown", F.coalesce("given_name_shown", F.lit("")))
        .withColumn("surname", F.coalesce("surname", F.lit("")))
        .withColumn(
            "block_key", F.coalesce("block_key", F.lit("__unblocked__"))
        )
        .withColumn(
            "name_reconstructed", F.coalesce("name_reconstructed", F.lit(0))
        )
        .withColumn("tokens", clean_tokens("full_text"))
        .withColumn("shingle_set", shingles_from_tokens(F.col("tokens"), n=3))
        # 64-bit hashes of the token/shingle sets: the pair double-join
        # shuffles these per pair, and an array<long> is ~4x smaller than
        # the string arrays (at 10^12 turns the pair-join shuffle is the
        # dominant byte mover).  Jaccard over hashes == jaccard over
        # strings modulo 2^-64 collisions.
        .withColumn("__th_seq", F.transform("tokens", lambda t: F.xxhash64(t)))
        .withColumn("token_hashes", F.array_sort(F.array_distinct("__th_seq")))
        .withColumn(
            "shingle_hashes", shingle_hashes_from_hash_seq(F.col("__th_seq"))
        )
        .withColumn("mention_id", F.concat_ws("#", "conv_id", F.lit("assistant")))
        .withColumn("role", F.lit("assistant"))
    )
    # X12 language feature: native lexicon argmax (operators/text.py);
    # feeds the lang_eq pair feature
    from pubmed_and_method_spark.operators.text import predict_lang

    sig = sig.withColumn("lang", predict_lang("full_text"))
    if tfidf:
        from pubmed_and_method_spark.functions.tfidf import tfidf_weight_maps

        # __th_seq keeps duplicates -> true term frequencies
        weights = tfidf_weight_maps(
            sig.select("conv_id", "__th_seq"), "conv_id", "__th_seq",
            top_k=tfidf_top_k,
        )
        sig = sig.join(weights, "conv_id", "left")
    return sig.drop("__th_seq")


def build_tfidf_terms(
    signatures: DataFrame, top_k: int | None = None
) -> DataFrame:
    """(mention_id, __wm: map<long,double>) per-mention top-k TF-IDF
    weight maps for the in-row X11 pair cosine (functions/tfidf.py) —
    the scale path.  Recomputes the duplicate-preserving token-hash
    sequence from the signatures' ``tokens`` column (token_hashes is
    distinct, which would erase term frequency), exactly as
    ``build_signatures(tfidf=True)`` does, so all X11 plans share
    weights bit-for-bit.

    r06 (guide §2.3/§2.4): returns the per-mention MAP directly via
    the fused ``tfidf_weight_maps`` plan — in-row term frequencies,
    one groupBy(id) with in-row top-k/norm/map assembly — instead of
    the exploded (mention_id, __h, __wn) narrow rows.  The narrow
    form materialized O(mentions x top_k) rows at every checkpoint
    (~90M rows at 33M turns) only for ``build_pair_features`` to
    immediately re-aggregate them into this exact map; consumers that
    need narrow rows (the ``sparse_join`` plan) explode the map back,
    which reproduces the same (id, term, weight) rows because map
    entries are assembled in ascending-hash order."""
    seq = signatures.select(
        "mention_id",
        F.transform("tokens", lambda t: F.xxhash64(t)).alias("__th_seq"),
    )
    from pubmed_and_method_spark.functions.tfidf import tfidf_weight_maps

    return tfidf_weight_maps(
        seq, "mention_id", "__th_seq", top_k=top_k, map_col="__wm"
    )


def build_candidate_pairs(
    signatures: DataFrame,
    num_buckets: int = 1,
    max_block_size: int | None = None,
    lsh: bool = False,
    lsh_hashes: int = 16,
    lsh_bands: int = 8,
    lsh_max_block_size: int | None = 64,
    lsh_col: str = "token_hashes",
    strict_split: bool = False,
    adaptive_target: int | None = None,
    phonetic: bool = False,
    del1: bool = False,
    snb: bool = False,
    snb_window: int = 6,
) -> DataFrame:
    """Multi-pass blocking -> candidate pairs (canonical id1<id2).

    Pass 1: exact normalized-key blocks (J9 semantics,
    database/and_datasets.sql:56-68).  Pass 1.5 (``phonetic=True``):
    Soundex-class phonetic-key blocks (functions/names.phonetic_key)
    over (surname, first initial) — recovers pairs a surname typo
    severed from their exact block (the reference blocks only on the
    exact key, so byline typos silently cost it recall; q61 measures
    the recovery).  Pass 1.75 (``del1=True``): SymSpell
    deletion-neighborhood pairs at OSA distance 1 on the surname with
    equal first initials — PROVABLE recall for one-edit and
    adjacent-transposition typos where the phonetic key is heuristic
    (q85/q73: the strongest single recovery pass on the hard corpus,
    pair completeness 0.987; the four-pass union reaches 1.0).
    Recovered pairs are tagged ``'__del1__'``.  Pass 2 (``lsh=True``):
    MinHash-LSH banding over token-shingle sketches — recovers pairs
    whose mentions fall outside exact blocks (e.g. no parsable
    self-introduction), the north-star's second blocking pass.  LSH
    pairs not already produced by pass 1 are tagged
    ``block_key='__lsh__'``; phonetic-recovered pairs are tagged
    ``'ph_<phonetic block>'``.

    Shingle length: unigram (``token_hashes``) by default — measured
    same-entity jaccard on multi-turn transcripts is ~0.30 for token
    sets vs ~0.016 for word-3-gram sets (turn texts are short and
    order-noisy), so 16 hashes x 8 bands (r=2) gives ~95% per-victim
    recall through any of ~4 sibling conversations while banding keeps
    the candidate volume ~6% of cross-entity pairs.  Pass
    ``lsh_col='shingle_hashes'`` for 3-gram sketches on longer texts.

    Every pair also carries ``split_group``, the key the train/test
    group split must use: exact pairs use their block key; LSH pairs
    use the lexicographic min of the two members' own exact block keys
    (falling back to a conv-derived key for unblocked mentions).  The
    literal '__lsh__' tag is NEVER a split group — hashing it would
    send every LSH-recovered pair to one side of the split wholesale.

    The guarantee is EXACT for exact-block pairs (whole blocks land on
    one side, the GroupShuffleSplit contract of
    src/comparison/inner_feature_method.py:48-55) but APPROXIMATE for
    LSH-recovered pairs: least(__sg1, __sg2) can pick the partner's
    conv-derived '__c_<conv>' key (which sorts below lowercase block
    keys), so a mention whose exact pairs hash to one side can have an
    LSH pair hash to the other.  Measured on the synthetic corpus the
    straddle rate is small (LSH pairs are a few percent of pairs and
    most carry a real block key on both sides).

    ``strict_split=True`` buys the EXACT guarantee: a union-find
    (connected components) over the group-key graph linked by LSH
    pairs collapses every connected set of groups to one canonical
    component key, so ALL pairs touching a mention share one split
    group.  Costs an O(log n)-round iterative stage over the (small)
    group-key graph before training.
    """
    members = signatures.select("block_key", "mention_id", "conv_id").filter(
        F.col("block_key") != "__unblocked__"
    )
    pairs = generate_pairs(
        members,
        key_col="block_key",
        id_col="mention_id",
        num_buckets=num_buckets,
        max_block_size=max_block_size,
        carry_cols=("conv_id",),
        adaptive_target=adaptive_target,
    ).withColumn("split_group", F.col("block_key"))
    # The exact pair set is referenced twice when recovery passes run
    # (anti-join + final union).  A lazy localCheckpoint pin was tried
    # and REVERTED (r06): the ~2.5 GB of pinned pair rows outlive the
    # pairing stage inside the fused pipeline action and evict
    # execution memory from the features/CC stages downstream —
    # measured net-negative end to end (guide §5), while the saved
    # recompute is one salted self-join (~5 s at 33M turns).

    conv_of = F.substring_index  # mention_id = conv_id#role
    # each member's entity-bearing group key: its exact block key, or a
    # conv-derived key when it never parsed into a block (used by the
    # phonetic + LSH passes for split-group assignment)
    mention_groups = signatures.select(
        "mention_id",
        F.when(
            F.col("block_key") != "__unblocked__", F.col("block_key")
        ).otherwise(F.concat(F.lit("__c_"), F.col("conv_id"))).alias("__sg"),
    )

    def _tag_extra(cand: DataFrame, block_tag) -> DataFrame:
        """Attach split groups + conv ids to a recovery pass's pairs
        (those not already produced by an earlier pass)."""
        return (
            cand.join(
                pairs.select("mention_id1", "mention_id2"),
                ["mention_id1", "mention_id2"],
                "left_anti",
            )
            .join(
                mention_groups.withColumnRenamed("mention_id", "mention_id1")
                .withColumnRenamed("__sg", "__sg1"),
                "mention_id1",
            )
            .join(
                mention_groups.withColumnRenamed("mention_id", "mention_id2")
                .withColumnRenamed("__sg", "__sg2"),
                "mention_id2",
            )
            .withColumn("block_key", block_tag)
            .withColumn("split_group", F.least("__sg1", "__sg2"))
            .withColumn("conv_id1", conv_of(F.col("mention_id1"), "#", 1))
            .withColumn("conv_id2", conv_of(F.col("mention_id2"), "#", 1))
        )

    out_cols = [
        "block_key", "split_group",
        "mention_id1", "mention_id2", "conv_id1", "conv_id2",
    ]
    extra_tagged: list[DataFrame] = []

    if phonetic:
        from pubmed_and_method_spark.functions.names import phonetic_key

        phon_members = signatures.filter(
            (F.col("surname") != "") & (F.col("given_name") != "")
        ).select(
            F.concat_ws(
                "_", phonetic_key("surname"), F.substring("given_name", 1, 1)
            ).alias("__pk"),
            "mention_id",
        )
        phon_raw = generate_pairs(
            phon_members,
            key_col="__pk",
            id_col="mention_id",
            num_buckets=num_buckets,
            max_block_size=max_block_size,
            carry_cols=(),
            adaptive_target=adaptive_target,
        )
        phon_tagged = _tag_extra(
            phon_raw.select(
                F.concat(F.lit("ph_"), F.col("__pk")).alias("__tag"),
                "mention_id1",
                "mention_id2",
            ),
            F.col("__tag"),
        )
        extra_tagged.append(phon_tagged)
        pairs = pairs.unionByName(phon_tagged.select(*out_cols))

    if del1:
        # Pass 1.75 (q85): SymSpell deletion-neighborhood on the
        # surname — PROVABLE distance-1 recall where the phonetic key
        # is heuristic (e.g. a typo that changes the Soundex class:
        # "smith" -> "sbith" keys S530 -> S130 and pass 1.5 misses
        # it).  Same first-initial constraint as the exact/phonetic
        # keys — a surname typo doesn't change the initial.
        from pubmed_and_method_spark.operators.blocking import (
            deletion_neighborhood_pairs,
        )

        dmem = signatures.filter(
            (F.col("surname") != "") & (F.col("given_name") != "")
        ).select(
            "mention_id",
            "surname",
            F.substring("given_name", 1, 1).alias("__ini"),
        )
        draw = deletion_neighborhood_pairs(
            dmem.select("mention_id", "surname"), "mention_id", "surname"
        )
        ini = dmem.select("mention_id", "__ini")
        draw = (
            draw.join(
                ini.withColumnRenamed("mention_id", "mention_id1")
                .withColumnRenamed("__ini", "__i1"),
                "mention_id1",
            )
            .join(
                ini.withColumnRenamed("mention_id", "mention_id2")
                .withColumnRenamed("__ini", "__i2"),
                "mention_id2",
            )
            .filter(F.col("__i1") == F.col("__i2"))
            .select("mention_id1", "mention_id2")
        )
        del_tagged = _tag_extra(draw, F.lit("__del1__"))
        extra_tagged.append(del_tagged)
        pairs = pairs.unionByName(del_tagged.select(*out_cols))

    if snb:
        # Pass 3 (q68/q73): sorted-neighborhood window over the
        # (surname, given_name) total order — catches pairs whose key
        # typo severs BOTH the exact and phonetic blocks but whose
        # shared sort-key prefix keeps them adjacent (q73 ladder:
        # union completeness 0.995 vs 0.787 exact-only on the hard
        # corpus).  Pairs come back in rank order; canonicalize to
        # id order before the anti-join against earlier passes.
        from pubmed_and_method_spark.operators.blocking import (
            sorted_neighborhood_pairs,
        )

        snb_members = signatures.filter(
            (F.col("surname") != "") & (F.col("given_name") != "")
        ).select("mention_id", "surname", "given_name")
        snb_raw = sorted_neighborhood_pairs(
            snb_members,
            ["surname", "given_name"],
            id_col="mention_id",
            window=snb_window,
        )
        snb_cand = snb_raw.select(
            F.least("mention_id1", "mention_id2").alias("mention_id1"),
            F.greatest("mention_id1", "mention_id2").alias("mention_id2"),
        )
        snb_tagged = _tag_extra(snb_cand, F.lit("__snb__"))
        extra_tagged.append(snb_tagged)
        pairs = pairs.unionByName(snb_tagged.select(*out_cols))

    if lsh:
        from pubmed_and_method_spark.operators.blocking import (
            lsh_candidate_pairs,
        )

        # lsh_max_block_size=64 (r05): band-bucket CAP, the one knob
        # that makes banded LSH scale-safe.  Per-pair band-collision
        # probability is corpus-size-INDEPENDENT, so candidate volume
        # grows ~quadratically with the corpus: measured at 33M turns
        # (2M mentions), the uncapped pass emitted 500.7M candidate
        # pairs — 488M of them from the 16k band buckets larger than
        # 64 members (44 buckets >1k members alone contributed 324M;
        # BENCH.md r05 histogram) — versus 24.8M exact-block pairs.
        # Entities here have ~5 mentions, so a band key grouping >64
        # mentions is template-vocabulary noise, not entity signal;
        # dropping those buckets trades a sliver of recall (a true
        # near-dup pair usually collides in several bands and
        # survives via a small one) for an ~11x candidate-volume cut.
        # The cap never binds on the small gate corpora, so F1 gates
        # and LSH-recovery tests are unaffected.
        cand2 = lsh_candidate_pairs(
            signatures.select("mention_id", lsh_col),
            id_col="mention_id",
            shingle_col=lsh_col,
            num_hashes=lsh_hashes,
            bands=lsh_bands,
            num_buckets=num_buckets,
            max_block_size=lsh_max_block_size,
            adaptive_target=adaptive_target,
        )
        lsh_tagged = _tag_extra(cand2, F.lit("__lsh__"))
        extra_tagged.append(lsh_tagged)
        pairs = pairs.unionByName(lsh_tagged.select(*out_cols))

    if strict_split and extra_tagged:
        # union-find over group keys: any two groups linked by a
        # recovery-pass pair (phonetic or LSH) must land on one side of
        # the split, so remap every linked group to its component's
        # canonical key.  The graph has one node per group KEY (not per
        # mention or pair) — tiny relative to the data, so the
        # iterative CC stage is cheap even at corpus scale.
        edge_parts = [
            t.select(F.col("__sg1").alias("u"), F.col("__sg2").alias("v"))
            for t in extra_tagged
        ]
        edges = edge_parts[0]
        for p in edge_parts[1:]:
            edges = edges.unionByName(p)
        edges = edges.where(F.col("u") != F.col("v")).distinct()
        mapping = connected_components(edges).select(
            F.col("id").alias("split_group"),
            F.col("component").alias("__sgc"),
        )
        pairs = (
            pairs.join(mapping, "split_group", "left")
            .withColumn(
                "split_group", F.coalesce("__sgc", F.col("split_group"))
            )
            .drop("__sgc")
        )
    return pairs


def build_labeled_pairs(
    signatures: DataFrame,
    truth: DataFrame,
    num_buckets: int = 1,
    max_block_size: int | None = None,
    lsh: bool = False,
    lsh_max_block_size: int | None = 64,
    strict_split: bool = False,
    adaptive_target: int | None = None,
    phonetic: bool = False,
    del1: bool = False,
    snb: bool = False,
    snb_window: int = 6,
) -> DataFrame:
    """Multi-pass candidate pairs + planted labels.

    Labels come from joining the truth table on both sides
    (same_entity = entity_id1==entity_id2), the SONG construction
    (and_datasets.sql:44-79).
    """
    pairs = build_candidate_pairs(
        signatures,
        num_buckets=num_buckets,
        max_block_size=max_block_size,
        lsh=lsh,
        lsh_max_block_size=lsh_max_block_size,
        strict_split=strict_split,
        adaptive_target=adaptive_target,
        phonetic=phonetic,
        del1=del1,
        snb=snb,
        snb_window=snb_window,
    )
    t = truth.select("conv_id", "entity_id")
    pairs = (
        any_join(pairs, t.withColumnRenamed("conv_id", "conv_id1")
                 .withColumnRenamed("entity_id", "entity_id1"), "conv_id1", broadcast=True)
        .transform(
            lambda d: any_join(
                d,
                t.withColumnRenamed("conv_id", "conv_id2").withColumnRenamed(
                    "entity_id", "entity_id2"
                ),
                "conv_id2",
                broadcast=True,
            )
        )
        .withColumn(
            "same_entity",
            (F.col("entity_id1") == F.col("entity_id2")).cast("int"),
        )
    )
    return pairs


def build_pair_features(
    pairs: DataFrame,
    signatures: DataFrame,
    monge_elkan: bool = False,
    tfidf_terms: DataFrame | None = None,
    tfidf_join: bool = False,
) -> DataFrame:
    """The flagship pair-assembly double-join (J3):
    pair table joined against the mention-feature table twice —
    database/pubmed_inner_outer_feature.sql:672-781 — then the
    vectorized feature stack (X1-X17 analogs).

    ``tfidf_terms``: narrow (mention_id, __h, __wn) weight rows from
    ``build_tfidf_terms`` — enables the SPARSE-INTERSECTION X11
    content cosine (r04 verdict weak #1).  Default plan (r06): each
    side's top-k (hash -> weight) map — built once per mention on the
    NARROW signature frame — rides the double-join, and the cosine is
    an in-row map_zip_with hash-merge dot, O(k1+k2) per pair with
    zero additional shuffles (functions/tfidf.map_cosine; replaces
    the r05 aligned-array array_position fold, which cost
    O(shared x n_tokens) compares per pair).  ``tfidf_join=True`` uses
    the exploded pair-keyed join instead (pair_cosine_from_terms) —
    for LONG-document corpora where n_tokens >> top_k; its
    O(pairs x terms) intermediate exceeded this box's disk at 33M on
    short transcripts (SCALE_AB notes).  All X11 plans (in-row,
    pair-join, legacy map column) produce bit-identical values —
    pinned by test_sparse_tfidf_cosine_bitwise_equals_map.  When
    ``tfidf_terms`` is None and signatures carry a ``tfidf`` map
    column, the legacy map path runs (bounded pair sets only — it
    disk-spilled the 33M pipeline at any truncation, the r04 DNF);
    with neither, content_tfidf_cos is 0.0.

    ``monge_elkan=True`` additionally computes the transposition-
    robust token-set name similarity (q80 operator) as a
    ``monge_elkan`` column — opt-in because unlike every projection
    feature above it costs two pair-keyed shuffles, and the default
    corpus plants no given/surname swaps for it to recover; corpora
    with name-order noise add it to the model via
    ``FEATURE_COLS + ["monge_elkan"]``.  Pairs the operator omits
    (either side tokenless) default to 0.0 — here it IS a feature
    vector slot, so a neutral fill beats dropping the pair."""
    feat_cols = [
        "mention_id",
        "given_name",
        "surname",
        "token_hashes",
        "shingle_hashes",
        "tool_profile",
        "ts_min",
        "ts_max",
        "block_key",
    ]
    has_lang = "lang" in signatures.columns
    if has_lang:
        feat_cols.append("lang")
    # sparse terms supersede the map column: never ship maps through
    # the double-join when the narrow path is available
    has_tfidf = "tfidf" in signatures.columns and tfidf_terms is None
    if has_tfidf:
        feat_cols.append("tfidf")
    if tfidf_terms is not None and not tfidf_join:
        # X11 in-row MAP plan (r06): each side carries its top-k
        # (hash -> weight) map through the double-join and the dot is
        # ONE map_zip_with hash-merge per pair — O(k1+k2) — replacing
        # the r05 aligned-array fold whose array_position lookup cost
        # O(shared x n_tokens) integer compares per pair (the fold ran
        # inside the pair-join condition; guide §4.2/§1.2 "per-task
        # work").  ``tfidf_terms`` normally arrives in map form
        # already (build_tfidf_terms); legacy narrow (id, __h, __wn)
        # frames are aggregated here for back-compat.  Bit-parity with
        # the legacy map path is by the SAME argument as
        # pair_cosine_from_terms: map keys are assembled ascending,
        # shared terms multiply in ascending-key order, and keys
        # present on only one side contribute an exact IEEE754 0.0
        # (x + 0.0 == x), so all X11 plans stay bitwise equal (pinned
        # by test_sparse_tfidf_cosine_bitwise_equals_map).
        wmap = (
            tfidf_terms
            if "__wm" in tfidf_terms.columns
            else aligned_weight_column(tfidf_terms)
        )
        signatures = signatures.join(wmap, "mention_id", "left")
        feat_cols.append("__wm")
    s = signatures.select(*feat_cols)
    s1 = s.select([F.col(c).alias(f"{c}1") for c in feat_cols]).withColumnRenamed(
        "block_key1", "bk1"
    )
    s2 = s.select([F.col(c).alias(f"{c}2") for c in feat_cols]).withColumnRenamed(
        "block_key2", "bk2"
    )
    # X11 pair-join plan (opt-in, long-document corpora): attach the
    # cosine to the NARROW pair table BEFORE the double-join — one
    # extra double per pair row rides the shuffles the double-join
    # pays anyway
    if tfidf_terms is not None and tfidf_join:
        narrow_terms = (
            tfidf_terms.select(
                "mention_id", F.explode("__wm").alias("__h", "__wn")
            )
            if "__wm" in tfidf_terms.columns
            else tfidf_terms
        )
        cos = pair_cosine_from_terms(
            pairs.select("mention_id1", "mention_id2"), narrow_terms
        )
        pairs = pairs.join(
            cos, ["mention_id1", "mention_id2"], "left"
        ).withColumn(
            "content_tfidf_cos",
            F.coalesce("content_tfidf_cos", F.lit(0.0)),
        )
    # No join-strategy hints here — measured at 33M turns (BENCH.md
    # r05): AQE converts the signature sides to broadcast joins from
    # their compressed runtime sizes, and the lean spine then moves
    # 4.3 GB of pair-stage shuffle in 463 s; forcing SHUFFLE_HASH on
    # the same sides (tried as a sort-spill fix) disabled those
    # conversions and ballooned the SAME workload to 86 GB / 994 s.
    # Let the optimizer pick; the real scale levers are row width
    # (narrow feat_cols, top_k-capped weight arrays) and the
    # session's shuffle-codec/GC disk budget (session.py).
    df = pairs.join(s1, "mention_id1").join(s2, "mention_id2")
    # X16 ambiguity: each SIDE brings its own block's score and the
    # pair takes the max.  For exact pairs both sides share the pair's
    # block, so this equals the old per-pair join; for LSH-recovered
    # pairs it yields the members' true ambiguity instead of a 0.0
    # sentinel — which the GBT otherwise learns as a "this is an LSH
    # pair" shortcut (measured: a name_jw=0.707 cross-entity pair
    # scored 0.974 purely because ambiguity_score=0 tagged it LSH).
    amb = block_commonness(
        signatures.filter(F.col("block_key") != "__unblocked__"), "block_key"
    ).select("block_key", "ambiguity_score")
    df = (
        df.join(
            F.broadcast(
                amb.withColumnRenamed("block_key", "bk1")
                .withColumnRenamed("ambiguity_score", "__amb1")
            ),
            "bk1",
            "left",
        )
        .join(
            F.broadcast(
                amb.withColumnRenamed("block_key", "bk2")
                .withColumnRenamed("ambiguity_score", "__amb2")
            ),
            "bk2",
            "left",
        )
        .withColumn(
            "ambiguity_score",
            F.greatest(
                F.coalesce("__amb1", F.lit(0.0)),
                F.coalesce("__amb2", F.lit(0.0)),
            ),
        )
        .drop("bk1", "bk2", "__amb1", "__amb2")
    )

    day = 86400.0
    mid1 = (F.unix_timestamp("ts_min1") + F.unix_timestamp("ts_max1")) / 2
    mid2 = (F.unix_timestamp("ts_min2") + F.unix_timestamp("ts_max2")) / 2
    overlap_start = F.greatest(F.unix_timestamp("ts_min1"), F.unix_timestamp("ts_min2"))
    overlap_end = F.least(F.unix_timestamp("ts_max1"), F.unix_timestamp("ts_max2"))

    # X6 name block inputs: the transcript analog of (lastname,
    # firstname, initials) is (surname, given_name, first letter of the
    # given name as shown — empty when the name never parsed).
    init1 = F.substring("given_name1", 1, 1)
    init2 = F.substring("given_name2", 1, 1)
    full1 = F.concat(F.col("surname1"), F.col("given_name1"))
    full2 = F.concat(F.col("surname2"), F.col("given_name2"))

    df = (
        df.withColumn(
            "name_jw",
            jaro_winkler_udf(
                F.concat_ws(" ", "given_name1", "surname1"),
                F.concat_ws(" ", "given_name2", "surname2"),
            ),
        )
        # X6.1 / X6.2: char-set jaccards (pubmed_inner_feature_extract.py:28-29)
        .withColumn(
            "name_char_jacc_li",
            char_jaccard(F.concat(F.col("surname1"), init1),
                         F.concat(F.col("surname2"), init2)),
        )
        .withColumn("name_char_jacc_lf", char_jaccard(full1, full2))
        # X6.4: GS last-name length (:31)
        .withColumn(
            "lastname_len_avg",
            ((F.length("surname1") + F.length("surname2")) / 2.0),
        )
        # X6.5: GS first-name JW (:32)
        .withColumn(
            "given_jw", jaro_winkler_udf(F.col("given_name1"), F.col("given_name2"))
        )
        # X6.7 (X2): editops char-diff count == levenshtein (:17,34)
        .withColumn("name_edit_diff_chars", edit_diff_char_count(full1, full2))
        # X6.8: excluded uniq-char diff (:20-23)
        .withColumn(
            "name_uniq_char_diff",
            uniq_char_diff(F.concat(full1, init1), F.concat(full2, init2)),
        )
        # X6.9: initial-length score 2*min(len) (:26-27)
        .withColumn(
            "initial_len_score",
            (
                F.length(init1) + F.length(init2)
                - F.abs(F.length(init1) - F.length(init2))
            ).cast("int"),
        )
        .withColumn(
            "name_lev_ratio",
            levenshtein_ratio(F.col("given_name1"), F.col("given_name2")),
        )
        .withColumn("initial_eq", (init1 == init2).cast("int"))
        # all three inputs are duplicate-free by construction
        # (array_distinct'ed hashes / collect_set), so the distinct
        # form skips the array_union hash-set build per pair —
        # bit-identical values (same integers divided)
        .withColumn(
            "token_jacc",
            token_jaccard_distinct("token_hashes1", "token_hashes2"),
        )
        .withColumn(
            "shingle_jacc",
            token_jaccard_distinct("shingle_hashes1", "shingle_hashes2"),
        )
        .withColumn(
            "tool_jacc",
            token_jaccard_distinct("tool_profile1", "tool_profile2"),
        )
        # X15 sentinel form: disjoint non-empty tool profiles -> -1
        .withColumn(
            "tool_overlap_sentinel",
            sentinel_overlap("tool_profile1", "tool_profile2"),
        )
        # X12 language agreement (GS language feature analog); 1 when
        # signatures were built without the lang column
        .withColumn(
            "lang_eq",
            (F.col("lang1") == F.col("lang2")).cast("int")
            if has_lang
            else F.lit(1),
        )
        .withColumn("time_diff_days", F.abs(mid1 - mid2) / day)
        .withColumn(
            "time_overlap",
            ((overlap_end - overlap_start) > 0).cast("int"),
        )
        .withColumn("ambiguity_score", F.coalesce("ambiguity_score", F.lit(0.0)))
    )
    # X11: TF-IDF cosine (functions/tfidf.py); 0.0 when signatures were
    # built lean (tfidf=False, no terms table)
    if tfidf_terms is not None and not tfidf_join:
        df = df.withColumn(
            "content_tfidf_cos", map_cosine("__wm1", "__wm2")
        ).drop("__wm1", "__wm2")
    elif tfidf_terms is not None:
        pass  # pair-join plan attached the column above the double-join
    elif has_tfidf:
        df = df.withColumn(
            "content_tfidf_cos", map_cosine("tfidf1", "tfidf2")
        ).drop("tfidf1", "tfidf2")
    else:
        df = df.withColumn("content_tfidf_cos", F.lit(0.0))
    if monge_elkan:
        from pubmed_and_method_spark.operators.token_similarity import (
            monge_elkan_scores,
        )

        me_in = df.select(
            "mention_id1",
            "mention_id2",
            F.filter(
                F.array("given_name1", "surname1"), lambda x: x != ""
            ).alias("__nt1"),
            F.filter(
                F.array("given_name2", "surname2"), lambda x: x != ""
            ).alias("__nt2"),
        )
        me = monge_elkan_scores(me_in, "__nt1", "__nt2").select(
            "mention_id1", "mention_id2", "monge_elkan"
        )
        df = df.join(me, ["mention_id1", "mention_id2"], "left").withColumn(
            "monge_elkan", F.coalesce("monge_elkan", F.lit(0.0))
        )
    return df


def run_pipeline(
    spark: SparkSession,
    store: StageStore,
    seed: int = 42,
    algo: str = "gbt",
    num_buckets: int = 1,
    adaptive_target: int | None = 32,
    cluster_threshold: float = 0.85,
    lsh: bool = True,
    datagen_kwargs: dict | None = None,
    tfidf_top_k: int | None = 64,
    tfidf_mode: str = "sparse",
    blocking_metrics: bool = False,
    clusterer: str = "cc",
    transcripts: DataFrame | None = None,
    truth: DataFrame | None = None,
) -> dict:
    """Full AND pipeline on the synthetic corpus; returns metrics.

    ``clusterer``: 'cc' (default — transitive closure via
    large-star/small-star), 'star' (bounded-diameter star
    clustering, operators/star_clustering.py), or 'pivot'
    (KwikCluster-family parallel pivot,
    operators/pivot_clustering.py — diameter <= 2 like star but
    hash-"random" pivots instead of degree-greedy centers, the
    correlation-clustering 3-approximation family), or 'hac'
    (threshold-stopped average-link agglomerative merging within CC
    pre-partitions, operators/hac.py — the AND literature's default
    clustering family; exact despite the pre-partition because
    cross-component linkage is 0).  RESULTS.md
    "Clustering strategy" quantifies the tradeoff: at tight cuts star
    contains chain welds (B3 F1 0.653 vs 0.488 on the 2000-entity
    hard corpus); with near-certain edges closure recovers more.
    The stage key carries the choice, so checkpoint resume never
    mixes clusterings.

    ``blocking_metrics=True`` adds the q52 blocking-quality row
    (pair completeness / reduction ratio / block stats,
    operators/er_metrics.py) to the metrics dict — three extra linear
    aggregations; off by default so benchmark timings stay comparable
    across rounds (the job entrypoint turns it on).

    ``tfidf_mode`` selects the X11 content-cosine plan (values are
    bit-identical across modes — pinned by
    test_sparse_tfidf_cosine_bitwise_equals_map):
      'sparse' (default, the r05 scale fix): a checkpointed narrow
        (mention_id, term, weight) stage, weights aligned in-row to
        token_hashes, sorted-intersection fold on the pair row
        (functions/tfidf.array_pair_cosine) — ZERO shuffles beyond
        the double-join; the 33M-turn pipeline COMPLETES with the
        content feature on (SCALE_AB.json 'tfidf_sparse'), where the
        map path disk-spills at any truncation;
      'sparse_join': the exploded pair-keyed intersection join
        (pair_cosine_from_terms) — for long-document corpora where
        n_tokens >> top_k; its O(pairs x terms) intermediate exceeded
        this box's disk at 33M on short transcripts (measured, r05);
      'map': legacy weight-map column through the pair double-join —
        bounded corpora only;
      'off': no content feature (content_tfidf_cos = 0.0; the
        cluster-edge content bar then rests on token_jacc alone).

    ``tfidf_top_k=64`` is the SCALE DEFAULT: truncating each mention
    to its 64 heaviest terms (L2-renormalized) caps the sparse path's
    per-pair fan-out (and the map path's shuffle bytes) at O(k) per
    mention (functions/tfidf.py).  Measured on this corpus the cluster
    F1 is unchanged (the F1-gate pytest runs THIS default); pass None
    for exact untruncated weights — every oracle-paired query builds
    its own signatures and is unaffected by this default.

    ``adaptive_target=32`` is likewise the scale default for salting
    (r04 A/B, SCALE_AB.json): per-block s_b = ceil(n_b/32) beat the
    global s=4 by ~3% on the pair stage at 33M turns while giving hot
    LSH buckets quadratically more tasks; pair-set identity with the
    plain join is pytest-pinned, so metrics are unchanged.

    ``transcripts``/``truth``: externally-supplied input frames (e.g.
    sources/distributed_datagen at 33M+ turns, or a real Iceberg
    table) — when given, the built-in single-node synthetic generator
    is bypassed and ``datagen_kwargs`` is ignored; the stage graph,
    checkpoints, and metrics are identical either way (the r05
    supervised-at-scale runs use this, SCALE_AB.json
    'supervised_33M')."""
    # ADVICE r05: externally-supplied frames must not share a stage
    # fingerprint with the synthetic generator (a reused StageStore dir
    # would silently serve the other run's checkpoint).  'source'
    # separates the two; external frames additionally carry a
    # caller-visible schema/plan fingerprint so two different external
    # datasets don't collide either.
    if transcripts is None or truth is None:
        from pubmed_and_method_spark.sources.datagen import transcripts_df

        transcripts, truth = transcripts_df(
            spark, seed=seed, **(datagen_kwargs or {})
        )
        src_params: dict = {"source": "datagen",
                            "datagen_kwargs": sorted(
                                (datagen_kwargs or {}).items())}
    else:
        import hashlib

        plan_fp = hashlib.sha256(
            (
                str(transcripts.schema)
                + transcripts._jdf.queryExecution().logical().toString()
                + str(truth.schema)
                + truth._jdf.queryExecution().logical().toString()
            ).encode()
        ).hexdigest()[:16]
        src_params = {"source": "external", "plan_fp": plan_fp}
    transcripts = store.run_stage(
        "transcripts", lambda: transcripts,
        params={"seed": seed, **src_params},
    )
    truth = store.run_stage(
        "entities_truth", lambda: truth,
        params={"seed": seed, **src_params},
    )

    if tfidf_mode not in ("sparse", "sparse_join", "map", "off"):
        raise ValueError(f"unknown tfidf_mode {tfidf_mode!r}")
    signatures = store.run_stage(
        "signatures",
        lambda: build_signatures(
            transcripts,
            tfidf=(tfidf_mode == "map"),
            tfidf_top_k=tfidf_top_k,
        ),
        inputs=("transcripts",),
        params={
            "seed": seed,
            "tfidf_top_k": tfidf_top_k,
            "tfidf_mode": tfidf_mode,
        },
    )
    tfidf_terms = None
    if tfidf_mode in ("sparse", "sparse_join"):
        tfidf_terms = store.run_stage(
            "tfidf_terms",
            lambda: build_tfidf_terms(signatures, top_k=tfidf_top_k),
            inputs=("signatures",),
            # fmt marker: r06 switched this stage's schema from narrow
            # (id, __h, __wn) rows to per-mention weight maps — the
            # marker keys a fresh checkpoint so a store dir written by
            # older code can never resume into the wrong schema
            params={"tfidf_top_k": tfidf_top_k, "fmt": "wm"},
        )
    pairs = store.run_stage(
        "labeled_pairs",
        lambda: build_labeled_pairs(
            signatures, truth, num_buckets=num_buckets, lsh=lsh,
            adaptive_target=adaptive_target,
        ),
        inputs=("signatures", "entities_truth"),
        params={
            "num_buckets": num_buckets, "lsh": lsh,
            "adaptive_target": adaptive_target,
        },
    )
    features = store.run_stage(
        "pair_features",
        lambda: build_pair_features(
            pairs,
            signatures,
            tfidf_terms=tfidf_terms,
            tfidf_join=(tfidf_mode == "sparse_join"),
        ),
        inputs=(
            ("labeled_pairs", "signatures", "tfidf_terms")
            if tfidf_terms is not None
            else ("labeled_pairs", "signatures")
        ),
        params={"tfidf_mode": tfidf_mode},
    )

    # split on split_group (exact block key, or min member block key
    # for LSH-recovered pairs) — never the literal '__lsh__' tag
    split = grouped_split(features, "split_group", train_pct=70, salt=seed)
    train = split.filter(F.col("is_train") == 1)
    test = split.filter(F.col("is_train") == 0)
    model = fit_match_classifier(train, FEATURE_COLS, algo=algo, seed=seed)
    scored_test = predict_prob(model, test)
    metrics = pairwise_metrics(scored_test)

    # the error-analysis contract (database/statistics.sql:765-781):
    # misclassified pairs must carry EVERYTHING the model saw, so the
    # full feature stack rides into the scored/error stages — a user
    # can ask "what did the model see on this FP?" without recomputing
    scored_all = store.run_stage(
        "scored_pairs",
        lambda: predict_prob(model, split).select(
            "block_key",
            "mention_id1",
            "mention_id2",
            "same_entity",
            "is_train",
            "pred_prob",
            "pred",
            *FEATURE_COLS,
            *EXTRA_FEATURE_COLS,
        ),
        inputs=("pair_features",),
        params={"algo": algo, "seed": seed},
    )

    # M9 error-analysis sink: misclassified pairs land in their own
    # stage table (analog of database/statistics.sql:717-781)
    store.run_stage(
        "error_analysis",
        lambda: error_analysis(scored_all).filter(
            F.col("error_type").isNotNull()
        ),
        inputs=("scored_pairs",),
        params={"algo": algo},
    )

    # clustering uses a stricter edge bar than the 0.5 pair threshold:
    # transitive closure amplifies every FP edge into a full cluster
    # merge (precision collapse), while missing edges are recovered via
    # paths, so recall is cheap.  Beyond the probability bar, every
    # edge must carry CONTENT evidence: the GBT saturates its margins
    # (all positives > 0.95), so a homonym pair with matching names +
    # close timestamps can cross any prob bar alone, while measured
    # true-pair content is far higher (token_jacc median 0.30, TF-IDF
    # cosine median 0.72 vs <=0.26 on observed FP edges).
    matched = scored_all.filter(
        (F.col("pred_prob") > cluster_threshold)
        & (
            (F.col("content_tfidf_cos") > 0.4)
            | (F.col("token_jacc") > 0.25)
        )
    )
    if clusterer == "star":
        from pubmed_and_method_spark.operators.star_clustering import (
            star_clusters,
        )

        def _cluster():
            return star_clusters(
                matched.select(
                    "mention_id1", "mention_id2", "pred_prob"
                ),
                id_cols=("mention_id1", "mention_id2"),
                weight_col="pred_prob",
                rounds=32,
            ).select(
                F.col("node").alias("id"),
                F.col("center").alias("component"),
            )
    elif clusterer == "pivot":
        from pubmed_and_method_spark.operators.pivot_clustering import (
            pivot_clusters,
        )

        def _cluster():
            return pivot_clusters(
                matched.select("mention_id1", "mention_id2"),
                id_cols=("mention_id1", "mention_id2"),
                rounds=32,
            ).select(
                F.col("node").alias("id"),
                F.col("pivot").alias("component"),
            )
    elif clusterer == "hac":
        from pubmed_and_method_spark.operators.hac import (
            hac_within_blocks,
        )

        def _cluster():
            # CC pre-partition, then average-link HAC within each
            # component.  EXACT, not an approximation: with absent
            # pairs scoring 0, the linkage between clusters in
            # different components is 0 < threshold, so global HAC
            # would never merge across components either — CC only
            # bounds the per-group matrix (components of the matched
            # graph, small after the content-evidence edge bar) and
            # sets the applyInPandas parallelism.
            comp = connected_components(
                matched, u_col="mention_id1", v_col="mention_id2"
            ).select(F.col("id").alias("mention_id1"), "component")
            edges = matched.select(
                "mention_id1", "mention_id2", "pred_prob"
            ).join(comp, "mention_id1")
            # threshold 0.5, NOT cluster_threshold: with absent pairs
            # scoring 0 and matched-edge probs saturated near 1,
            # average linkage reads as matched CROSS-PAIR DENSITY —
            # 0.5 = "merge while a majority of cross pairs matched",
            # the density analog of a majority vote.  At
            # cluster_threshold (0.9) it demands 90% density and
            # splits true entities whose match subgraph has holes
            # (measured F1 0.947 vs 0.997 on the easy corpus).
            return hac_within_blocks(
                edges,
                block_col="component",
                id_cols=("mention_id1", "mention_id2"),
                sim_col="pred_prob",
                threshold=0.5,
                linkage="average",
            ).select(
                F.col("id"), F.col("cluster").alias("component")
            )
    elif clusterer == "cc":
        def _cluster():
            return connected_components(
                matched, u_col="mention_id1", v_col="mention_id2"
            )
    else:
        raise ValueError(f"unknown clusterer {clusterer!r}")
    components = store.run_stage(
        "clusters",
        _cluster,
        inputs=("scored_pairs",),
        params={
            "cluster_threshold": cluster_threshold,
            "clusterer": clusterer,
        },
    )

    # cluster-level pairwise agreement vs truth (within candidate pairs)
    cc = components.select(
        F.col("id").alias("mention_id"), "component"
    )
    with_cc = (
        scored_all.join(
            cc.withColumnRenamed("mention_id", "mention_id1").withColumnRenamed(
                "component", "component1"
            ),
            "mention_id1",
            "left",
        )
        .join(
            cc.withColumnRenamed("mention_id", "mention_id2").withColumnRenamed(
                "component", "component2"
            ),
            "mention_id2",
            "left",
        )
        .withColumn(
            "cluster_pred",
            (
                F.col("component1").isNotNull()
                & (F.col("component1") == F.col("component2"))
            ).cast("int"),
        )
    )
    cluster_metrics = pairwise_metrics(with_cc, pred_col="cluster_pred")

    out = {
        "pair_model": metrics,
        "clusters": cluster_metrics,
        "n_mentions": signatures.count(),
        "n_pairs": pairs.count(),
    }
    if blocking_metrics:
        from pubmed_and_method_spark.operators.er_metrics import (
            blocking_quality,
        )

        out["blocking"] = blocking_quality(
            signatures, pairs, truth
        ).collect()[0].asDict()
    return out
