"""Name enhancement: well-formed-name reconstruction (N2) and
first-name shape flags (N4).

N2 rebuilds database/author_name_enhancement.sql:85-120: among a
mention group that must share an author-compatible key (here the exact
block — surname + first initial), the LONGEST observed given name is
the well-formed one; mentions carrying a shorter (often single-initial
abbreviated) form inherit it.  The reference does the same across
linked sources (MAG/S2 names vs the PubMed abbreviation), lifting
full-name completeness 58.2% -> 91.0%; the transcript analog lifts
abbreviated self-introductions ("i am agent j smith") to the sibling
conversations' full given name.

N4 rebuilds model_building_using_rich_features.sql:629-633's
first-name shape flags as native exprs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def reconstruct_given_names(
    sig: DataFrame,
    group_col: str = "block_key",
    given_col: str = "given_name",
    salt_col: str = "conv_id",
) -> DataFrame:
    """Append ``given_name_wellform`` (the longest given name in the
    mention's group, length-then-lexicographic max for determinism)
    and ``name_reconstructed`` (1 when it upgraded a shorter form).

    Implemented as a window max over the existing blocking key — ONE
    shuffle, no self-join (a groupBy+join formulation would recompute
    the signature subtree twice inside one plan; measured 2x the whole
    signature stage).  The '__unblocked__' group shares no name
    evidence, so it is excluded from upgrades AND salted into 256
    window sub-partitions — otherwise every unblocked mention lands in
    one window task (the classic giant-partition skew).
    """
    from pyspark.sql import Window

    salt = F.when(
        F.col(group_col) == "__unblocked__",
        F.pmod(F.xxhash64(F.col(salt_col)), F.lit(256)),
    ).otherwise(F.lit(0))
    w = Window.partitionBy(group_col, "__wsalt")
    best = F.max(
        F.struct(
            F.length(given_col).alias("l"), F.col(given_col).alias("g")
        )
    ).over(w)["g"]
    out = sig.withColumn("__wsalt", salt).withColumn("__wellform", best)
    upgraded = (
        (F.col(group_col) != "__unblocked__")
        & F.col("__wellform").isNotNull()
        & (F.length("__wellform") > F.length(given_col))
    )
    return (
        out.withColumn(
            "given_name_wellform",
            F.when(upgraded, F.col("__wellform")).otherwise(F.col(given_col)),
        )
        .withColumn("name_reconstructed", upgraded.cast("int"))
        .drop("__wellform", "__wsalt")
    )


# a..z -> Soundex digit classes (b f p v=1, c g j k q s x z=2, d t=3,
# l=4, m n=5, r=6, vowels + h w y=0)
_PHON_CODES = "01230120022455012623010202"


def phonetic_key(col: Column | str) -> Column:
    """Portable Soundex-class phonetic key — blocking pass for
    misspelled surnames.

    The reference blocks ONLY on the exact normalized
    lastname+first-initial key (database/model_building_using_rich
    _features.sql:438-444), so a byline typo ("garcia" vs "gracia")
    silently severs the entity.  A phonetic key canonicalizes
    same-sounding spellings into one block: first letter + the first
    three Soundex consonant classes ("smith"/"smyth" -> S530,
    "garcia"/"gracia" -> G620).

    Variant note: classic Soundex collapses identical codes across an
    intervening h/w but not across vowels; this key treats BOTH as
    separators ("ashcraft" -> A226 here vs A261 classic).  The
    simplification buys an expression that is portable VERBATIM across
    engines (lower -> strip non-letters -> translate to digit classes
    -> collapse each digit's runs -> drop the first code -> drop
    vowels -> pad to 3), i.e. the same chain of builtins runs in Spark
    and in the DuckDB oracle (``phonetic_key_sql``) — whole-stage
    codegen, no UDF, no shuffle.
    """
    col = F.col(col) if isinstance(col, str) else col
    s = F.regexp_replace(F.lower(col), "[^a-z]", "")
    code = F.translate(s, "abcdefghijklmnopqrstuvwxyz", _PHON_CODES)
    for d in "0123456":
        code = F.regexp_replace(code, d + "{2,}", d)
    tail = F.regexp_replace(F.substring(code, 2, 1 << 30), "0", "")
    return F.when(s == "", F.lit("")).otherwise(
        F.concat(
            F.upper(F.substring(s, 1, 1)),
            F.rpad(F.substring(tail, 1, 3), 3, "0"),
        )
    )


def phonetic_key_sql(col: str) -> str:
    """The DuckDB-SQL twin of ``phonetic_key`` (same builtin chain)."""
    s = f"regexp_replace(lower({col}), '[^a-z]', '', 'g')"
    code = f"translate({s}, 'abcdefghijklmnopqrstuvwxyz', '{_PHON_CODES}')"
    for d in "0123456":
        code = f"regexp_replace({code}, '{d}{{2,}}', '{d}', 'g')"
    tail = f"replace(substr({code}, 2), '0', '')"
    return (
        f"CASE WHEN {s} = '' THEN '' "
        f"ELSE upper(substr({s}, 1, 1)) || rpad(substr({tail}, 1, 3), 3, '0') "
        "END"
    )


def fn_max_len_str(given: Column | str) -> Column:
    """Longest space-separated chunk of the dash-stripped given name
    (arrayReverseSort(x -> length(x), splitByChar(...))[1],
    model_building_using_rich_features.sql:630-631)."""
    given = F.col(given) if isinstance(given, str) else given
    parts = F.split(F.regexp_replace(given, "-", ""), " ")
    return F.get(
        F.array_sort(
            parts,
            lambda a, b: F.when(F.length(a) > F.length(b), F.lit(-1))
            .when(F.length(a) < F.length(b), F.lit(1))
            .otherwise(F.lit(0)),
        ),
        0,
    )


def fn_contain_dash(given: Column | str) -> Column:
    """position(fn, '-') > 0 (sql:632)."""
    given = F.col(given) if isinstance(given, str) else given
    return (F.instr(given, "-") > 0).cast("int")


def fn_contain_other_chars(given: Column | str) -> Column:
    """Chars outside [a-z- ] present (sql:633)."""
    given = F.col(given) if isinstance(given, str) else given
    return (
        F.length(F.regexp_replace(given, r"[a-z\- ]", "")) > 0
    ).cast("int")


def name_shape_flags(sig: DataFrame, given_col: str = "given_name") -> DataFrame:
    """Append the three N4 flags."""
    return (
        sig.withColumn("fn_max_len_str", fn_max_len_str(given_col))
        .withColumn("fn_contain_dash", fn_contain_dash(given_col))
        .withColumn("fn_contain_other_chars", fn_contain_other_chars(given_col))
    )
