"""Full-text-search normalization shared between the engine and oracles.

Reference surface: ``datafusion-pg-functions/src/text_search.rs`` (the
ts_* family). PG's 'english' config stems lexemes with the Snowball
porter stemmer; we implement a porter-LITE — the high-frequency suffix
rules with minimum-length guards standing in for Porter's measure
conditions. Round 4 added Snowball's step-1c y→i (carry/carries
co-stem to 'carri') and the post-ed/ing double-consonant undoubling
(hopping/hopped/hop co-stem to 'hop'; l/s/z and vowels excluded, as in
Snowball). Documented deviation: rarer suffixes (-alize, -icate, the
li-deletion) are not rewritten; both documents and queries pass through
the SAME stemmer, so matching stays consistent.

Every step below is written in the SQL intersection of Spark SQL and
DuckDB (CASE / LIKE / substr / length / concat), so a DuckDB oracle can
replay the engine's normalization verbatim: the engine composes steps
with ``transform``, the oracle with ``list_transform``.
"""

from __future__ import annotations

# applied in order; `w` is the lambda variable rebound at each step
STEM_STEPS: list[str] = [
    # step 1: plurals (sses→ss, ies→i, keep ss, strip trailing s)
    ("CASE WHEN w LIKE '%sses' THEN substr(w, 1, length(w)-2) "
     "WHEN w LIKE '%ies' THEN substr(w, 1, length(w)-2) "
     "WHEN w LIKE '%ss' THEN w "
     "WHEN w LIKE '%s' AND length(w) > 3 THEN substr(w, 1, length(w)-1) "
     "ELSE w END"),
    # step 2: verbal endings (eed→ee, ied→i, ing/ed stripped with guards;
    # Snowball's undoubling folded into the strip branches: hopping →
    # hopp → hop, but falling → fall since l/s/z never undouble)
    ("CASE WHEN w LIKE '%eed' AND length(w) > 4 "
     "THEN substr(w, 1, length(w)-1) "
     "WHEN w LIKE '%ied' THEN substr(w, 1, length(w)-2) "
     "WHEN w LIKE '%ing' AND length(w) > 5 THEN "
     "CASE WHEN substr(w, length(w)-4, 1) = substr(w, length(w)-3, 1) "
     "AND substr(w, length(w)-3, 1) NOT IN "
     "('a','e','i','o','u','l','s','z') "
     "THEN substr(w, 1, length(w)-4) ELSE substr(w, 1, length(w)-3) END "
     "WHEN w LIKE '%ed' AND length(w) > 4 THEN "
     "CASE WHEN substr(w, length(w)-3, 1) = substr(w, length(w)-2, 1) "
     "AND substr(w, length(w)-2, 1) NOT IN "
     "('a','e','i','o','u','l','s','z') "
     "THEN substr(w, 1, length(w)-3) ELSE substr(w, 1, length(w)-2) END "
     "ELSE w END"),
    # step 2b (Snowball 1c): y→i when preceded by a non-vowel that is not
    # the word's first letter (carry→carri, try→tri; day stays day)
    ("CASE WHEN w LIKE '%y' AND length(w) > 2 "
     "AND substr(w, length(w)-1, 1) NOT IN ('a','e','i','o','u','y') "
     "THEN concat(substr(w, 1, length(w)-1), 'i') ELSE w END"),
    # step 3: derivational suffixes
    ("CASE WHEN w LIKE '%ational' THEN concat(substr(w, 1, length(w)-7), "
     "'ate') "
     "WHEN w LIKE '%tional' THEN substr(w, 1, length(w)-2) "
     "WHEN w LIKE '%ization' THEN concat(substr(w, 1, length(w)-7), 'ize') "
     "WHEN w LIKE '%fulness' THEN substr(w, 1, length(w)-4) "
     "WHEN w LIKE '%ousness' THEN substr(w, 1, length(w)-4) "
     "WHEN w LIKE '%iveness' THEN substr(w, 1, length(w)-4) "
     "WHEN w LIKE '%ment' AND length(w) > 6 THEN substr(w, 1, length(w)-4) "
     "WHEN w LIKE '%ness' AND length(w) > 5 THEN substr(w, 1, length(w)-4) "
     "ELSE w END"),
    # step 4: final -e (merge→merg, table→tabl — matches snowball here)
    ("CASE WHEN w LIKE '%e' AND length(w) > 4 "
     "THEN substr(w, 1, length(w)-1) ELSE w END"),
]


def stemmed_array_sql(lexemes_expr: str, transform_fn: str) -> str:
    """Wrap an array-of-lexemes SQL expression in the stem chain.

    ``transform_fn`` is ``"transform"`` (Spark) or ``"list_transform"``
    (DuckDB) — the generated text is otherwise identical on both engines.
    """
    out = lexemes_expr
    for step in STEM_STEPS:
        out = f"{transform_fn}({out}, w -> {step})"
    return out


def tsquery_group_sql(transform_fn: str, zip_fn: str) -> str:
    """Compile ONE tsquery conjunct (lambda var ``c``, bound by the
    caller's transform over the '&'-split) into its '|'-joined OR-group:
    strip optional parens, split on '|', record '!' negations, clean +
    stopword-drop + stem each atom (stem skipped for 'simple' config via
    the outer ``cfg`` parameter), then re-attach '!' prefixes and join.

    Inlined textually into the pg_tsquery_parse SQL UDF because a SQL UDF
    cannot receive a lambda variable as an argument."""
    from datafusion_postgres_spark.operators.text import EN_STOPWORDS

    stop = "array(" + ", ".join(f"'{s}'" for s in EN_STOPWORDS) + ")"
    inner = ("split(regexp_replace(trim(c), '^\\\\((.*)\\\\)$', '$1'), "
             "'\\\\|')")
    negs = f"{transform_fn}({inner}, x -> startswith(trim(x), '!'))"
    clean = (f"{transform_fn}({inner}, "
             "x -> regexp_replace(lower(x), '[^a-z0-9]+', ''))")
    nostop = (f"{transform_fn}({clean}, "
              f"x -> CASE WHEN array_contains({stop}, x) THEN '' "
              "ELSE x END)")
    stemmed = stemmed_array_sql(nostop, transform_fn)
    pick = ("CASE WHEN lower(coalesce(cfg, 'english')) LIKE '%simple%' "
            f"THEN {nostop} ELSE {stemmed} END")
    return (f"array_join(filter({zip_fn}({pick}, {negs}, "
            "(s, ng) -> CASE WHEN s = '' OR s IS NULL THEN NULL "
            "ELSE concat(CASE WHEN ng THEN '!' ELSE '' END, s) END), "
            "e -> e IS NOT NULL), '|')")
