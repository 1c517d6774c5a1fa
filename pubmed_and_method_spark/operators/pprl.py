"""Privacy-preserving record linkage (PPRL): Bloom-filter name
encodings compared by Dice similarity (Schnell, Bachteler & Reiher,
BMC Med Inf & Dec Making 2009).

Two catalog owners who may not exchange PLAINTEXT names (the standard
constraint in medical/administrative linkage) each encode every name
into a Bloom filter — padded character q-grams, k seeded hash
functions — and share only the bit sets.  Dice similarity of the
filters approximates q-gram overlap of the underlying names, so
linkage proceeds on encodings alone.  The reference compares
plaintext directly everywhere (src/eutilities/string_utils.py); this
is the drop-in primitive for the setting where it cannot.

Engineering:
- the filter is a SPARSE sorted array of set bit positions, not a
  bitmap: set ops become array_intersect/size (native, codegen'd),
  and at the default density (~40 of 256 bits) sparse is also the
  smaller shuffle payload;
- positions come from the engine-portable md5 space
  (conv(substr(md5(gram || '#' || h), 1, 8), 16, 10) % m — the q19/q32
  idiom), so any engine reproduces the encoding bit-for-bit;
- everything is native array/hash exprs — no UDF, embarrassingly
  parallel at encode time; Dice is an exact integer ratio, so
  cross-engine value parity needs no rounding tricks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_bits(
    col: Column | str,
    m_bits: int = 256,
    k_hashes: int = 4,
    gram_len: int = 2,
) -> Column:
    """Sorted distinct bit positions of the Bloom encoding of a string.

    Grams are taken from the '_'-padded lowercased value (padding makes
    first/last characters carry positional evidence, per Schnell et
    al.); each gram sets ``k_hashes`` positions derived from
    md5(gram || '#' || h) mod ``m_bits``.
    """
    s = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit("_"), F.lower(s), F.lit("_"))
    n_grams = F.char_length(padded) - (gram_len - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: padded.substr(i, F.lit(gram_len)),
    )
    pos = F.flatten(
        F.transform(
            grams,
            lambda g: F.array(
                *[
                    F.pmod(
                        F.conv(
                            F.substring(
                                F.md5(F.concat(g, F.lit(f"#{h}"))), 1, 8
                            ),
                            16,
                            10,
                        ).cast("long"),
                        F.lit(m_bits),
                    )
                    for h in range(k_hashes)
                ]
            ),
        )
    )
    return F.array_sort(F.array_distinct(pos))


def dice_similarity(a: Column | str, b: Column | str) -> Column:
    """Dice coefficient 2|A∩B| / (|A|+|B|) of two position sets —
    exact integer ratio (0.0 on two empty sets)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    inter = F.size(F.array_intersect(a, b))
    denom = F.size(a) + F.size(b)
    return F.when(denom > 0, 2.0 * inter / denom).otherwise(F.lit(0.0))


def bloom_encode(
    df: DataFrame,
    col: str,
    id_col: str,
    m_bits: int = 256,
    k_hashes: int = 4,
    gram_len: int = 2,
) -> DataFrame:
    """(id, bloom) — one encoded row per record; the only columns a
    catalog owner shares."""
    return df.select(
        id_col,
        bloom_bits(col, m_bits, k_hashes, gram_len).alias("bloom"),
    )


def bloom_bits_sql(
    col: str, m_bits: int = 256, k_hashes: int = 4, gram_len: int = 2
) -> str:
    """DuckDB expression computing the identical encoding (oracle
    twin of ``bloom_bits``)."""
    padded = f"('_' || lower({col}) || '_')"
    gram = f"substr({padded}, i, {gram_len})"
    per_gram = ", ".join(
        f"(('0x' || substr(md5({gram} || '#{h}'), 1, 8))::BIGINT % {m_bits})"
        for h in range(k_hashes)
    )
    return (
        "list_sort(list_distinct(flatten(list_transform("
        f"range(1, len({padded}) - {gram_len - 1} + 1), "
        f"i -> [{per_gram}]))))"
    )
