"""Full 38-province / 456-city dictionary + hybrid locate strategy.

Pins the flattened semantics of detect_location_from_text
(utils.py:336-437) at the real dim size, including the reference loop's
break structure: exact city names break the city loop (first exact match
wins), part/abbreviation matches don't (the LAST matching city wins —
'jakarta' alone → Jakarta Timur), a match in an earlier province beats
anything in a later one, and the province fallback only applies when no
city term matched. Boundary semantics are the reference's \\b regex: terms
behind punctuation ('di bandung!', '(jakarta)') still match."""

from __future__ import annotations

from mbgspark.locations import (
    CITY_ABBREVIATIONS,
    build_full_locations_dim,
    locate_compiled,
    locate_hybrid,
)
from mbgspark.locations_data import INDONESIA_LOCATIONS


def test_dim_shape_and_order():
    rows = build_full_locations_dim()
    assert len(INDONESIA_LOCATIONS) == 38
    assert sum(len(v) for v in INDONESIA_LOCATIONS.values()) == 456
    # every canonical city present as a term row
    terms = {r[3] for r in rows}
    assert "jakarta selatan" in terms and "surabaya" in terms
    # all abbreviations present
    assert set(CITY_ABBREVIATIONS) <= terms
    # dict_order strictly increasing and unique terms
    orders = [r[2] for r in rows]
    assert orders == sorted(orders) and len(set(orders)) == len(orders)
    assert len(terms) == len(rows)
    # every province fallback row sits below every city row
    city_max = max(r[2] for r in rows if r[1] is not None)
    prov_min = min(r[2] for r in rows if r[1] is None)
    assert prov_min > city_max
    by_term = {r[3]: r for r in rows}
    # tier A before tier B within a province: the exact 'jakarta selatan'
    # row outranks the part row 'jakarta' (Case-1 break beats Case-2)
    assert by_term["jakarta selatan"][2] < by_term["jakarta"][2]
    # reversed tier-B order: the shared part 'jakarta' resolves to the LAST
    # DKI city carrying it (the reference keeps overwriting detected_city)
    assert by_term["jakarta"][1] == "jakarta timur"


def test_hybrid_first_match_semantics(spark):
    rows = build_full_locations_dim()
    fact = spark.createDataFrame(
        [
            (1, "kunjungan di Jakarta Selatan kemarin"),   # exact multi-word (tier A)
            (2, "acara sby keren"),                        # abbreviation
            (3, "warga jawa barat senang"),                # part 'barat' shadows province
            (4, "tinggal di bandung, dekat alun-alun"),    # separator prep
            (5, "tidak ada lokasi disini"),                # no match
            (6, "provinsi gorontalo mantap"),              # province fallback
            (7, "jakarta"),                                # bare part → last DKI city
            (8, "di bandung!"),                            # punctuation boundary
            (9, "(jakarta)"),                              # punctuation boundary
        ],
        "id bigint, text string",
    )
    got = {
        r["id"]: (r["province"], r["city"])
        for r in locate_hybrid(fact, rows, "id", "text").collect()
    }
    # Case-1 exact match breaks the reference's city loop — it beats every
    # part row, so 'Jakarta Selatan' resolves exactly (utils.py:366-371)
    assert got[1] == ("dki jakarta", "jakarta selatan")
    assert got[2] == ("jawa timur", "surabaya")
    # Case-2 part matches don't break the loop: the LAST matching city
    # wins — 'barat' resolves to jakarta barat (DKI precedes jawa barat's
    # province fallback, and no exact name matches)
    assert got[3] == ("dki jakarta", "jakarta barat")
    assert got[4] == ("jawa barat", "bandung")
    assert got[5] == (None, None)
    # 'gorontalo' appears as a CITY under Sulawesi Tengah in the reference's
    # JSON (a data quirk reproduced faithfully) — the city row wins over the
    # gorontalo province fallback
    assert got[6] == ("sulawesi tengah", "gorontalo")
    # last-match-wins among the DKI part rows (reference loop trace)
    assert got[7] == ("dki jakarta", "jakarta timur")
    # \b boundaries: punctuation does not block a match
    assert got[8] == ("jawa barat", "bandung")
    assert got[9] == ("dki jakarta", "jakarta timur")


def test_compiled_and_hybrid_strategies_agree(spark):
    """locate_compiled (constant-map projection) and locate_hybrid
    (token/containment joins) are two physical plans of the same operator —
    they must return identical (province, city) for every row, including on
    natural text with no injected locations."""
    from pyspark.sql import functions as F

    from mbgspark.io import load_table

    rows = build_full_locations_dim()
    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    fact = d.select("doc_id", F.col("text"))
    a = {
        r["doc_id"]: (r["province"], r["city"])
        for r in locate_compiled(fact, rows, "doc_id", "text").collect()
    }
    b = {
        r["doc_id"]: (r["province"], r["city"])
        for r in locate_hybrid(fact, rows, "doc_id", "text").collect()
    }
    assert a == b and len(a) > 0


def _ref_detect(text):
    """Literal Python re-implementation of the reference's nested loop
    (utils.py:336-432, with the repo's documented working-alias Case 3) —
    the parity truth both fuzz tests compare the Spark strategies against.
    Python's unicode-aware \\b is the boundary semantics being mirrored."""
    import re

    s = text.lower()
    for sep in ["-", "/", "\\", "|", "_", ",", ";", "."]:
        s = s.replace(sep, " ")
    dp = dc = None
    for province, cities in INDONESIA_LOCATIONS.items():
        for city in cities:
            cl = city.lower()
            if re.search(r"\b" + re.escape(cl) + r"\b", s):
                dp, dc = province, city
                break
            for part in cl.split():
                if len(part) > 2 and re.search(
                    r"\b" + re.escape(part) + r"\b", s
                ):
                    dp, dc = province, city
                    break
            for ab, full in CITY_ABBREVIATIONS.items():
                if full == cl and re.search(
                    r"\b" + re.escape(ab) + r"\b", s
                ):
                    dp, dc = province, city
                    break
        if dc:
            break
    if not dc:
        from mbgspark.locations import province_variations

        for province in INDONESIA_LOCATIONS:
            pl = province.lower()
            for v in [pl, *province_variations(pl)]:
                if v and re.search(r"\b" + re.escape(v) + r"\b", s):
                    dp = province
                    break
            if dp:
                break
    return (dp.lower() if dp else None, dc.lower() if dc else None)


def test_reference_loop_parity_fuzz(spark):
    """Drive BOTH Spark strategies against _ref_detect over texts that hit
    every break-path: exact-vs-part tiers, last-match overwrite,
    cross-province precedence, punctuation boundaries (ASCII and unicode),
    separator translation, province fallback."""
    rows = build_full_locations_dim()
    ref_detect = _ref_detect

    texts = [
        "kunjungan di Jakarta Selatan kemarin",
        "jakarta",
        "tangerang selatan",          # exact 'tangerang' breaks before 'tangerang selatan'
        "jakarta, selatan",           # 1:1 translate → double space → multi-word no-match
        "tinggal di bandung-kota",    # 'kota' part of Aceh's Kota Bakti wins (earlier province)
        "warga jawa barat senang",
        "yogyakarta dan semarang",    # exact 'semarang' is an earlier Jawa Tengah city
        "solo gudeg",
        "(jakarta)",
        "di bandung!",
        "banda aceh!",
        "jaksel jaktim",
        "riau kepulauan",
        "kalt timur",
        "sul tenggara",
        "ntb",
        "nothing here at all",
        "",
        # unicode punctuation boundaries (VERDICT r3 item 5): the
        # reference's Python \b sees a boundary at curly quotes, dashes,
        # ellipsis, NBSP, ZWSP, soft hyphen — the translate table must too
        "di \u201cjakarta\u201d kemarin",     # curly double quotes
        "menuju bandung\u2014kota",          # em-dash
        "\u00absurabaya\u00bb mantap",       # guillemets
        "sby\u2026 keren",                   # ellipsis after abbreviation
        "di\u00a0bandung",                   # no-break space
        "jakarta\u200bselatan",              # zero-width space splits tokens
        "\u2026bandung\u2026",
        "kota\u2013baru",                    # en-dash
        "jawa\u00adtengah",                  # soft hyphen
        "ke jakarta\u201a selatan",          # low-9 quote between words
        "di yogyakarta\u2032",               # prime
        # unicode LETTERS must NOT create boundaries (Python \w matches
        # them): glued terms stay unmatched on the glued side
        "caf\u00e9jakarta selatan",          # é-glued first word
        "jakarta selatan\u00e9 asik",        # é-glued last word
        "caf\u00e9bandung",                  # é-glued single word → no match
        "bandung\u00e9",                     # trailing é-glue → no match
    ]
    fact = spark.createDataFrame(
        list(enumerate(texts)), "id bigint, text string"
    )
    expected = {i: ref_detect(t) for i, t in enumerate(texts)}
    for strategy in (locate_compiled, locate_hybrid):
        got = {
            r["id"]: (r["province"], r["city"])
            for r in strategy(fact, rows, "id", "text").collect()
        }
        assert got == expected, strategy.__name__


def test_reference_loop_parity_random_fuzz(spark):
    """Seeded random fuzz (the round-3 3,000-case one-off, now pinned and
    extended with unicode punctuation): texts are random compositions of
    dictionary terms, noise words, ASCII/unicode punctuation glue, and —
    for single-word terms only — unicode LETTER glue (which must suppress
    the match). Both Spark strategies must agree with _ref_detect on every
    one. Unicode-letter glue on multi-word terms is exercised by the
    curated cases instead: combined with the same term's words appearing
    free elsewhere in one text it hits the documented residual corner of
    the per-document token guard."""
    import random

    from mbgspark.locations import UNICODE_BOUNDARY_CHARS

    rows = build_full_locations_dim()
    rng = random.Random(20260814)
    singles = [t for _p, _c, _o, t in rows if " " not in t]
    multis = [t for _p, _c, _o, t in rows if " " in t]
    noise = ["foo", "dunia", "makan", "bergizi", "xyz", "hello", "12", "ok"]
    punct_glue = list("!?()[]:#@'\"") + list(UNICODE_BOUNDARY_CHARS[:24])
    letter_glue = ["\u00e9", "\u00fc", "\u00f1", "\u00df"]

    def segment():
        kind = rng.random()
        if kind < 0.35:
            w = rng.choice(singles)
            g = rng.random()
            if g < 0.3:
                return rng.choice(punct_glue) + w + rng.choice(punct_glue)
            if g < 0.45:
                # unicode-letter glue: must NOT match (Python \w covers é)
                return rng.choice(letter_glue) + w
            if g < 0.55:
                return w + rng.choice(letter_glue)
            return w
        if kind < 0.55:
            t = rng.choice(multis)
            g = rng.random()
            if g < 0.3:
                return rng.choice(punct_glue) + t + rng.choice(punct_glue)
            if g < 0.4:
                # unicode punct INSIDE the phrase: kills the multi-word
                # match (reference needs a literal space) but may free the
                # component words as tokens
                return t.replace(" ", rng.choice(punct_glue), 1)
            return t
        return rng.choice(noise)

    texts = [
        " ".join(segment() for _ in range(rng.randint(1, 4)))
        for _ in range(240)
    ]
    fact = spark.createDataFrame(
        list(enumerate(texts)), "id bigint, text string"
    )
    expected = {i: _ref_detect(t) for i, t in enumerate(texts)}
    for strategy in (locate_compiled, locate_hybrid):
        got = {
            r["id"]: (r["province"], r["city"])
            for r in strategy(fact, rows, "id", "text").collect()
        }
        diffs = {
            i: (got[i], expected[i], texts[i])
            for i in expected
            if got[i] != expected[i]
        }
        assert not diffs, (strategy.__name__, dict(list(diffs.items())[:5]))
