"""Shared column-expression helpers (all JVM-side, codegen-friendly).

These encode the engine's oracle-parity conventions (see ``registry``):
exact decimal aggregation for 2-dp money columns, string-formatted
date/timestamp outputs, and a deterministic 60-bit md5-derived hash that is
expressible identically in DuckDB (``('0x'||substr(md5(x),1,15))::BIGINT``)
— the foundation of the oracle-checkable MinHash / fingerprint operators.

Everything here is a composition of built-in ``pyspark.sql.functions`` —
no Python UDFs — so whole-stage codegen and columnar execution apply.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec2(c: Column | str) -> Column:
    """Exact decimal view of a 2-dp double column (testdata invariant)."""
    return F.col(c).cast(DEC) if isinstance(c, str) else c.cast(DEC)


def sum_dbl(c: Column | str) -> Column:
    """Exact sum of a 2-dp double column, returned as double.

    Decimal accumulation is associative/exact, so Spark's partial+final
    aggregation and DuckDB's vectorized sum produce the *same* decimal, and
    the final double cast is bitwise identical in both engines.
    """
    return F.sum(dec2(c)).cast("double")


def avg_dbl(c: Column | str) -> Column:
    """Exact-sum-based average: CAST(sum_dec AS DOUBLE) / COUNT(c).

    A single IEEE-754 division on identical inputs — bitwise-stable across
    engines, unlike native AVG over doubles (summation-order dependent).
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(dec2(col)).cast("double") / F.count(col)


def fmt_date(c: Column | str) -> Column:
    """Date/timestamp → 'yyyy-MM-dd' string (hash-stable output form)."""
    return F.date_format(c, "yyyy-MM-dd")


def fmt_ts(c: Column | str) -> Column:
    """Timestamp → microsecond string (DuckDB strftime '%f' equivalent)."""
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")


def md5_long60(c: Column) -> Column:
    """Deterministic 60-bit non-negative hash: first 15 hex digits of md5.

    Oracle equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    Used as the base hash for MinHash signatures, fingerprints and SimHash —
    md5 is identical in every engine, unlike xxhash64/murmur.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# Universal-hash family over the md5 base hash, mod p = 2^31 - 1 (Mersenne).
# h_i(x) = (A_i * (x mod p) + B_i) mod p ; A_i,B_i < p so products fit in
# 62 bits — no BIGINT overflow in either engine (both are ANSI-strict).
MINHASH_P = 2_147_483_647
MINHASH_COEF = (
    (1_103_515_245, 12_345),
    (1_566_083_941, 1_013_904_223),
    (1_812_433_253, 314_159_265),
    (69_069, 362_437),
    (1_229_782_938, 2_147_483_587),
    (747_796_405, 1_181_783_497),
    (214_013, 2_531_011),
    (134_775_813, 1),
)


def universal_hash(base: Column, i: int) -> Column:
    """i-th universal hash of a non-negative base hash column."""
    a, b = MINHASH_COEF[i]
    return (F.lit(a) * (base % F.lit(MINHASH_P)) + F.lit(b)) % F.lit(MINHASH_P)


def universal_hash_sql(base_sql: str, i: int) -> str:
    """DuckDB SQL text for ``universal_hash`` over a base-hash expression."""
    a, b = MINHASH_COEF[i]
    return f"(({a} * (({base_sql}) % {MINHASH_P}) + {b}) % {MINHASH_P})"


def tokens(c: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization (oracle: str_split)."""
    return F.split(F.col(c) if isinstance(c, str) else c, sep)


def shingles(tok: Column, n: int = 3) -> Column:
    """n-gram shingles of a token array, joined with spaces.

    Oracle: ``list_transform(range(len(t)-n+1), i -> array_to_string(t[i+1:i+n], ' '))``
    (DuckDB slices are 1-based inclusive).  Empty when fewer than n tokens.
    """
    # Guard short inputs explicitly: Spark's sequence(0, stop) DESCENDS
    # when stop < 0 (yielding [0, -1] → slice start 0 → runtime error),
    # unlike the SQL twin's range() which is empty — without the when()
    # a doc with fewer than n tokens crashes the Spark side while the
    # oracle side silently produces no shingles.
    return F.when(
        F.size(tok) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tok) - n),
            lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(tok_sql: str, n: int = 3) -> str:
    """DuckDB SQL for ``shingles`` over a token-list expression."""
    return (
        f"list_transform(range(0, greatest(len({tok_sql}) - {n} + 1, 0)), "
        f"i -> array_to_string(({tok_sql})[i+1:i+{n}], ' '))"
    )


MD5_LONG60_SQL = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, JVM-side.

    Sequential left-fold sums (``F.aggregate``) match DuckDB's
    ``list_dot_product`` evaluation order, giving bitwise-identical doubles.
    """

    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


#: Bit-spread masks for 64-bit Morton (Z-order) interleaving: after step
#: k, the input's bits sit 2^k apart.  Plain positive int64 literals, so
#: Spark and DuckDB run the identical two's-complement arithmetic.
_ZSPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _zspread(x: Column) -> Column:
    """Spread a 32-bit value's bits to the even positions of an int64.

    NB: ``Column.bitwiseOR/bitwiseAND``, not Python ``|``/``&`` — the
    Python operators resolve to BOOLEAN or/and on Columns."""
    x = x.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _ZSPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder64(a: Column, b: Column) -> Column:
    """64-bit Morton (Z-order) key of two NON-NEGATIVE sub-2^31 integer
    dimensions: ``a``'s bits on even positions, ``b``'s on odd — points
    close in (a, b) space land close on the key, so range-sorting by it
    clusters BOTH dimensions into every parquet row group (multi-column
    data skipping, io/maintenance.py::write_zordered).  Stays positive
    for 31-bit inputs; oracle twin :func:`zorder64_sql` is bit-identical.
    """
    return _zspread(a).bitwiseOR(F.shiftleft(_zspread(b), 1))


def _zspread_sql(x_sql: str) -> str:
    s = f"((CAST(({x_sql}) AS BIGINT)) & 4294967295)"
    for shift, mask in _ZSPREAD:
        s = f"((({s}) | (({s}) << {shift})) & {mask})"
    return s


def zorder64_sql(a_sql: str, b_sql: str) -> str:
    """DuckDB SQL text for :func:`zorder64` over two expressions."""
    return f"(({_zspread_sql(a_sql)}) | (({_zspread_sql(b_sql)}) << 1))"


def canonical_url(u: Column) -> Column:
    """Canonical form of an http(s) URL — the web-pipeline dedup key
    (crawls reach the same page through case variants, default ports,
    fragments, dot segments, duplicate/trailing slashes, and reordered
    query strings):

    * fragment dropped; scheme+host lowercased; default port stripped;
    * path: ``//+`` collapsed, ``/./`` segments removed, a trailing
      ``/.`` or ``/`` stripped (root ``/`` kept), empty path → ``/``;
    * query: params split on ``&``, empties dropped, sorted, rejoined.

    ``..`` segments are NOT resolved (needs a fold; callers with
    dot-dot URLs should pre-resolve).  Twin: :func:`canonical_url_sql`
    — bit-identical text out of DuckDB, so URL-dedup censuses are
    oracle-hashable."""
    no_frag = F.regexp_replace(u, r"#.*$", "")
    scheme_host = F.lower(
        F.regexp_extract(no_frag, r"^([a-zA-Z]+://[^/?#]*)", 1)
    )
    host = F.regexp_replace(
        F.regexp_replace(scheme_host, r"^(https://[^:/]*):443$", "$1"),
        r"^(http://[^:/]*):80$",
        "$1",
    )
    rest = F.regexp_replace(no_frag, r"^[a-zA-Z]+://[^/?#]*", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"(?:/\.)+/", "/")
    path = F.regexp_replace(path, r"/\.$", "")
    path = F.regexp_replace(path, r"(.+)/$", "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qnorm = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda x: x != "")), "&"
    )
    return F.concat(
        host,
        path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
    )


def canonical_url_sql(u_sql: str) -> str:
    """DuckDB SQL text for :func:`canonical_url` over an expression.
    Engine deltas handled here: DuckDB needs the ``'g'`` flag for
    global regexp_replace (Spark is global by default) and ``\\1``
    backreferences (Spark uses ``$1``)."""
    no_frag = f"regexp_replace(({u_sql}), '#.*$', '')"
    scheme_host = f"lower(regexp_extract({no_frag}, '^([a-zA-Z]+://[^/?#]*)', 1))"
    host = (
        f"regexp_replace(regexp_replace({scheme_host}, "
        f"'^(https://[^:/]*):443$', '\\1'), '^(http://[^:/]*):80$', '\\1')"
    )
    rest = f"regexp_replace({no_frag}, '^[a-zA-Z]+://[^/?#]*', '')"
    path = f"regexp_extract({rest}, '^([^?]*)', 1)"
    query = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    path = f"regexp_replace({path}, '/{{2,}}', '/', 'g')"
    path = f"regexp_replace({path}, '(?:/\\.)+/', '/', 'g')"
    path = f"regexp_replace({path}, '/\\.$', '')"
    path = f"regexp_replace({path}, '(.+)/$', '\\1')"
    path = f"(CASE WHEN ({path}) = '' THEN '/' ELSE ({path}) END)"
    # COALESCE: DuckDB's array_to_string([]) is NULL, Spark's array_join
    # of an empty array is '' — align on ''.
    qnorm = (
        f"COALESCE(array_to_string(list_sort(list_filter("
        f"string_split({query}, '&'), x -> x <> '')), '&'), '')"
    )
    return (
        f"({host} || {path} || "
        f"(CASE WHEN ({qnorm}) = '' THEN '' ELSE '?' || ({qnorm}) END))"
    )
