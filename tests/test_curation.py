"""Unit tests for the corpus-curation operators (contamination check,
content-hash mixing sampler, char entropy, boilerplate-line removal)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from neulix_datahub_spark.operators.curation import (
    benchmark_excerpt,
    benchmark_ngram_contamination,
    hash_bucket_hex,
    hash_mixing_sample,
    rate_to_hex_cutoff,
    remove_boilerplate_lines,
)
from neulix_datahub_spark.operators.text import char_entropy


def test_rate_to_hex_cutoff_edges():
    assert rate_to_hex_cutoff(0.0) == "0000"
    assert rate_to_hex_cutoff(0.5) == "8000"
    assert rate_to_hex_cutoff(0.25) == "4000"
    # rate 1.0 must sort above every 4-char hex string (keep-all), not
    # produce the 5-char "10000" which string-compares *below* "9001"
    assert rate_to_hex_cutoff(1.0) == "g"
    assert "ffff" < rate_to_hex_cutoff(1.0)


def test_hash_mixing_sample_rates_and_determinism(spark):
    df = spark.range(400).select(
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )
    kept = hash_mixing_sample(df, {"en": 0.5, "de": 0.0})
    rows = kept.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in rows}
    assert "de" not in counts  # rate 0 drops the stratum entirely
    assert 0.3 < counts["en"] / 200 < 0.7  # ~half of 200 en docs
    # content-addressed: same input -> identical sample, run to run
    assert sorted(r["text"] for r in kept.collect()) == sorted(
        r["text"] for r in hash_mixing_sample(df, {"en": 0.5, "de": 0.0}).collect()
    )
    # rate 1.0 keeps everything
    assert hash_mixing_sample(df, {"en": 1.0, "de": 1.0}).count() == 400


def test_hash_mixing_sample_keeps_duplicates_together(spark):
    df = spark.createDataFrame(
        [(i, "en", f"dup text {i % 5}") for i in range(50)],
        ["doc_id", "lang", "text"],
    )
    kept = hash_mixing_sample(df, {"en": 0.5})
    # every one of the 5 distinct contents is fully kept or fully dropped
    per_text = kept.groupBy("text").count().collect()
    assert all(r["count"] == 10 for r in per_text)


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aabb"), (2, "aaaa"), (3, ""), (4, "abc")], ["id", "t"]
    )
    got = {
        r["id"]: r["e"]
        for r in df.select("id", char_entropy("t").alias("e")).collect()
    }
    assert abs(got[1] - math.log(2)) < 1e-6
    assert got[2] == 0.0  # single symbol -> zero entropy
    assert got[3] == 0.0  # empty -> zero by convention
    assert abs(got[4] - math.log(3)) < 1e-6


def test_entropy_and_top_word_share_match_naive_reference(spark):
    """Property check for the round-3 sorted-run folds: on arbitrary
    token soups, the fold forms must equal the naive count-per-distinct
    Python computations they replaced (same normalization first)."""
    import collections
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from neulix_datahub_spark.operators.text import top_word_share

    token = st.text(alphabet="abcXY12! ", min_size=0, max_size=6)

    @settings(max_examples=12, deadline=None)
    @given(st.lists(token, min_size=0, max_size=12))
    def check(tokens):
        raw = " ".join(tokens)
        df = spark.createDataFrame([(raw,)], ["t"])
        row = df.select(
            char_entropy("t").alias("e"), top_word_share("t").alias("w")
        ).first()

        norm = re.sub(r"\s+", " ", raw.lower()).strip()
        chars = list(norm)
        if chars:
            n = len(chars)
            counts = collections.Counter(chars)
            want_e = -sum((c / n) * math.log(c / n) for c in counts.values())
        else:
            want_e = 0.0
        # Engine semantics (since r8): an empty/whitespace-only doc has no
        # words, so top_word_share is 0.0 — not the ``''.split(' ') == ['']``
        # artifact that would report share 1.0 for a nonexistent word.
        words = norm.split(" ") if norm else []
        want_w = max(collections.Counter(words).values()) / len(words) if words else 0.0
        assert abs(row["e"] - want_e) < 1e-5, (raw, row["e"], want_e)
        assert abs(row["w"] - want_w) < 1e-9, (raw, row["w"], want_w)

    check()


def test_contamination_detects_planted_overlap(spark):
    eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    train = spark.createDataFrame(
        [
            (1, f"leading tokens {eight} trailing junk here"),
            (2, "completely unrelated content with many different words"),
            (3, "short doc"),  # < 8 tokens: whole-text shingle, no match
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(f"prefix {eight} suffix",)], ["text"])
    hits = sorted(
        r["doc_id"] for r in benchmark_ngram_contamination(train, bench).collect()
    )
    assert hits == [1]


def test_benchmark_excerpt_truncates(spark):
    df = spark.createDataFrame(
        [(" ".join(f"t{i}" for i in range(30)),), ("only three tokens",)],
        ["text"],
    )
    rows = sorted(r["text"] for r in benchmark_excerpt(df, first_tokens=5).collect())
    assert rows == ["only three tokens", "t0 t1 t2 t3 t4"]


def test_remove_boilerplate_preserves_order_and_empty_docs(spark):
    bp = "subscribe now"
    rows = [(i, f"unique line {i}\n{bp}\nbody {i}") for i in range(10)]
    rows.append((100, bp))  # pure-boilerplate doc
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["text"], r["n_lines_removed"])
        for r in remove_boilerplate_lines(df, min_docs=10).collect()
    }
    assert len(out) == 11
    # interior boilerplate removed, surrounding order kept
    assert out[0] == ("unique line 0\nbody 0", 1)
    # the all-boilerplate doc survives with empty text
    assert out[100] == ("", 1)


def test_remove_boilerplate_matches_case_insensitively(spark):
    df = spark.createDataFrame(
        [(i, f"keep {i}\nSubscribe NOW") for i in range(5)]
        + [(9, "keep 9\nsubscribe now")],
        ["doc_id", "text"],
    )
    out = remove_boilerplate_lines(df, min_docs=6)
    assert all(r["n_lines_removed"] == 1 for r in out.collect())


def test_stratified_topn_exact_budget_and_determinism(spark):
    from neulix_datahub_spark.operators.curation import stratified_topn_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}", f"content {i}") for i in range(60)],
        ["doc_id", "source", "text"],
    )
    kept = stratified_topn_sample(df, 4, strata_col="source")
    per = {r["source"]: r["count"] for r in kept.groupBy("source").count().collect()}
    assert per == {"s0": 4, "s1": 4, "s2": 4}
    # deterministic winners, run to run
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_topn_sample(df, 4, strata_col="source").collect()
    )
    assert a == b
    # small strata are kept whole, not padded
    tiny = spark.createDataFrame([(1, "s", "x"), (2, "s", "y")],
                                 ["doc_id", "source", "text"])
    assert stratified_topn_sample(tiny, 5, strata_col="source").count() == 2


def test_dup_ngram_fraction_known_values(spark):
    from neulix_datahub_spark.operators.text import dup_ngram_fraction

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # 5 bigrams, 2 distinct -> 0.6
            (2, "w x y z"),        # all distinct -> 0.0
            (3, "solo"),           # < 2 tokens -> 0.0
            (4, ""),
        ],
        ["id", "t"],
    )
    got = {
        r["id"]: r["f"]
        for r in df.select("id", dup_ngram_fraction("t").alias("f")).collect()
    }
    assert abs(got[1] - 0.6) < 1e-9
    assert got[2] == 0.0
    assert got[3] == 0.0
    assert got[4] == 0.0


def test_hash_bucket_hex_matches_duckdb(spark, ddb):
    spark_rows = {
        r["t"]: r["h"]
        for r in spark.createDataFrame([("alpha",), ("beta",)], ["t"])
        .select("t", hash_bucket_hex("t").alias("h"))
        .collect()
    }
    for t, h in spark_rows.items():
        assert ddb.execute(f"SELECT substring(md5('{t}'), 1, 4)").fetchone()[0] == h


# --- hash_split (round-4 hardening: VERDICT item 9) ---------------------------

def test_hash_split_python_mirror_parity(spark):
    """hash_split is a pure function of the bytes: a python md5 mirror
    predicts every assignment exactly, on arbitrary hypothesis texts —
    the engine-independence claim its docstring makes."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from neulix_datahub_spark.operators.curation import hash_split

    weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    cut_train = rate_to_hex_cutoff(0.9)
    cut_val = rate_to_hex_cutoff(0.95)

    def mirror(text: str) -> str:
        # The engine domain-separates every hash family; hash_split's
        # buckets are md5('split:' || text) (operators/curation.py:382).
        b = hashlib.md5(("split:" + text).encode("utf-8")).hexdigest()[:4]
        return "train" if b < cut_train else ("val" if b < cut_val else "test")

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.text(min_size=0, max_size=20), min_size=1, max_size=8,
                    unique=True))
    def check(texts):
        df = spark.createDataFrame([(t,) for t in texts], ["text"])
        got = {r.text: r.split for r in hash_split(df, weights).collect()}
        assert got == {t: mirror(t) for t in texts}

    check()


def test_hash_split_stable_under_growth_and_fractions(spark):
    """Adding documents never moves an existing one between splits,
    duplicates co-locate, and observed fractions track the weights
    (deterministic binomial check at n=2500, >3 sigma tolerance)."""
    from collections import Counter

    from neulix_datahub_spark.operators.curation import hash_split

    weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = [(f"doc number {i} with some content",) for i in range(2000)]
    b = [(f"later-arriving doc {i}",) for i in range(500)]
    got_a = {
        r.text: r.split
        for r in hash_split(spark.createDataFrame(a, ["text"]), weights).collect()
    }
    got_ab = {
        r.text: r.split
        for r in hash_split(spark.createDataFrame(a + b, ["text"]), weights).collect()
    }
    assert all(got_ab[t] == s for t, s in got_a.items())

    dup = spark.createDataFrame([("same text",), ("same text",)], ["text"])
    assert len({r.split for r in hash_split(dup, weights).collect()}) == 1

    c = Counter(got_ab.values())
    n = len(got_ab)
    assert abs(c["train"] / n - 0.90) < 0.02, c
    assert abs(c["val"] / n - 0.05) < 0.02, c
    assert abs(c["test"] / n - 0.05) < 0.02, c


def test_export_corpus_roundtrip_and_integrity(spark, tmp_path):
    """export_corpus lands shard=N dirs + a manifest whose counts and
    order-insensitive checksums verify_export re-derives; corruption
    (a dropped row) is caught and named."""
    import json

    from neulix_datahub_spark.operators.curation import export_corpus, verify_export
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    path = str(tmp_path / "export")
    manifest = export_corpus(docs, path, n_shards=4)
    assert manifest["total_rows"] == docs.count()
    assert set(manifest["shards"]) == {0, 1, 2, 3}
    assert verify_export(spark, path) is True
    # checksums are exact 64-bit integers rendered as digits — a double
    # would print scientific notation and lose low bits
    for sh in manifest["shards"].values():
        assert sh["checksum"].isdigit(), sh["checksum"]
        assert int(sh["checksum"]) < 2**64
    # manifest on disk matches the returned dict (keys stringified by json)
    on_disk = json.loads((tmp_path / "export" / "_MANIFEST.json").read_text())
    assert on_disk["total_rows"] == manifest["total_rows"]

    # determinism: re-export of the same corpus produces identical manifest
    manifest2 = export_corpus(docs, str(tmp_path / "export2"), n_shards=4)
    assert manifest2 == manifest

    # corruption: drop one row from shard 0 and rewrite that shard dir
    import pathlib
    shard0 = spark.read.parquet(f"{path}/shard=0")
    shard0.limit(shard0.count() - 1).write.mode("overwrite").parquet(
        str(tmp_path / "s0fix")
    )
    import shutil
    sdir = pathlib.Path(path) / "shard=0"
    shutil.rmtree(sdir)
    shutil.copytree(tmp_path / "s0fix", sdir)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="shard 0"):
        verify_export(spark, path)


def test_export_corpus_deterministic_shuffle_order(spark, tmp_path):
    """shuffle_seed fixes the within-shard row ORDER content-addressably:
    two exports agree file-order-exactly; a different seed produces a
    different (but still deterministic) order; row sets are unchanged."""
    from neulix_datahub_spark.operators.curation import export_corpus
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")

    def order(path, seed):
        export_corpus(docs, path, n_shards=2, shuffle_seed=seed)
        return [
            [r.doc_id for r in spark.read.parquet(f"{path}/shard={s}").collect()]
            for s in (0, 1)
        ]

    a = order(str(tmp_path / "e1"), seed=7)
    b = order(str(tmp_path / "e2"), seed=7)
    c = order(str(tmp_path / "e3"), seed=8)
    assert a == b                      # same seed -> identical order
    assert a != c                      # different seed -> different order
    assert sorted(a[0] + a[1]) == sorted(c[0] + c[1])  # same rows
    assert a[0] != sorted(a[0])        # genuinely shuffled vs id order


def test_priority_sample_invariants(spark):
    """DLT priority sampling: exactly min(k, |stratum|) rows per
    stratum; est_weight >= the row's own weight; strata smaller than k
    return whole with est_weight == weight (tau undefined); and the
    draw is a pure function of the id — two invocations agree
    row-for-row."""
    from neulix_datahub_spark.operators.curation import priority_sample

    rows = [(i, "big", float(1 + i % 50)) for i in range(200)] + [
        (1000 + i, "tiny", 5.0) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, w double")
    got = priority_sample(df, 10, "w", strata_col="lang", id_col="doc_id")
    by_lang = {}
    for r in got.collect():
        by_lang.setdefault(r.lang, []).append(r)
    assert len(by_lang["big"]) == 10
    assert len(by_lang["tiny"]) == 3
    assert all(r.est_weight >= r.w for rs in by_lang.values() for r in rs)
    # tiny stratum: the sample IS the population -> estimator is exact
    assert all(r.est_weight == r.w for r in by_lang["tiny"])

    again = priority_sample(df, 10, "w", strata_col="lang", id_col="doc_id")
    key = lambda r: (r.lang, r.doc_id, r.est_weight)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, again.collect()))


def test_priority_sample_favors_heavy_rows(spark):
    """Weight-proportional inclusion: with weights 100 vs 1, the heavy
    minority must dominate the sample (each heavy row's priority is
    100x a light row's at equal draws)."""
    from neulix_datahub_spark.operators.curation import priority_sample

    rows = [(i, 100.0 if i % 10 == 0 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    got = priority_sample(df, 25, "w", id_col="doc_id").collect()
    heavy = sum(1 for r in got if r.w == 100.0)
    assert len(got) == 25
    assert heavy >= 20  # 50 heavy rows exist; they should crowd out the 450 light


def test_portable_uniform_range_and_determinism(spark):
    from neulix_datahub_spark.operators.curation import portable_uniform

    df = spark.range(10_000).select(portable_uniform("id").alias("u"))
    row = df.agg(
        F.min("u"), F.max("u"), F.countDistinct("u"), F.avg("u")
    ).first()
    assert 0.0 < row[0] and row[1] <= 1.0
    assert row[2] > 9_900  # essentially all distinct
    assert 0.45 < row[3] < 0.55  # roughly uniform mean

    # negative ids: pmod keeps the LCG state non-negative, so the draw
    # stays in (0, 1] — a signed % would emit u <= 0 and corrupt (or
    # ANSI-abort) the w/u priority divide downstream
    neg = (
        spark.range(10_000)
        .select((F.col("id") * -1 - 1).alias("id"))
        .select(portable_uniform("id").alias("u"))
    )
    nrow = neg.agg(F.min("u"), F.max("u"), F.avg("u")).first()
    assert 0.0 < nrow[0] and nrow[1] <= 1.0
    assert 0.45 < nrow[2] < 0.55


def test_mixture_resample_budget_exact(spark):
    """Largest-remainder rounding: integer targets sum EXACTLY to the
    budget (floor(total/2)), every target is >= 0, and sqrt-temperature
    compresses shares (the biggest source's target share is below its
    raw share; the smallest's is above)."""
    from neulix_datahub_spark.plans.queries_scale import mixture_resample_plan
    from tests.conftest import SF_DIR

    rows = mixture_resample_plan(spark, SF_DIR).collect()
    total = sum(r.c_docs for r in rows)
    assert sum(r.target_n for r in rows) == total // 2
    assert all(r.target_n >= 0 for r in rows)
    big = max(rows, key=lambda r: r.c_docs)
    small = min(rows, key=lambda r: r.c_docs)
    budget = total // 2
    # sqrt-compression shows through the ±1 largest-remainder noise
    assert big.target_n / budget < big.c_docs / total + 1.5 / budget
    assert small.target_n / budget > small.c_docs / total - 1.5 / budget
    # and exactly (no rounding noise) on the pre-rounding shares
    import math

    sumw = sum(math.sqrt(r.c_docs) for r in rows)
    assert math.sqrt(big.c_docs) / sumw <= big.c_docs / total
    assert math.sqrt(small.c_docs) / sumw >= small.c_docs / total


# --- salt domain separation (round-9 hardening: VERDICT r8 item 4) -----------

def test_salt_domains_keep_pipeline_stages_independent(spark, tmp_path):
    """The correlation catastrophe the per-stage salts fixed, as a pinned
    property: compose hash_mixing_sample -> hash_split -> export_corpus
    shard assignment over one corpus and assert each stage's outcome is
    statistically INDEPENDENT of the raw (un-salted) content hash.

    Without domain separation every stage keys on the same md5(text)
    prefix, so e.g. a 30% sample followed by an 80/10/10 split puts every
    surviving doc in train (measured in r8 before the fix,
    operators/curation.py:85). Each assertion below measures agreement
    between a stage outcome and the un-salted-hash prediction of that
    outcome; removing any one salt drives its agreement to 1.0 while the
    salted expectation sits far below the asserted ceiling (n=4000 docs,
    content-addressed => fully deterministic, no flake)."""
    import hashlib

    from neulix_datahub_spark.operators.curation import (
        export_corpus,
        hash_split,
    )

    n = 4000
    docs = spark.range(n).select(
        F.concat(F.lit("corpus doc "), F.col("id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
    )
    texts = [f"corpus doc {i}" for i in range(n)]

    def raw_bucket(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:4], 16)

    cut30 = int(rate_to_hex_cutoff(0.3), 16)
    cut80 = int(rate_to_hex_cutoff(0.8), 16)
    cut90 = int(rate_to_hex_cutoff(0.9), 16)

    # stage 1: 30% content-hash sample
    kept = hash_mixing_sample(docs, {"en": 0.3}, strata_col="lang")
    kept_set = {r.text for r in kept.select("text").collect()}
    agree_keep = sum(
        ((t in kept_set) == (raw_bucket(t) < cut30)) for t in texts
    ) / n
    # independent: 0.3*0.3 + 0.7*0.7 = 0.58; un-salted sample: 1.0
    assert 0.45 < agree_keep < 0.75, agree_keep

    # stage 2: 80/10/10 split of the survivors
    split_of = {
        r.text: r.split
        for r in hash_split(kept, {"train": 0.8, "val": 0.1, "test": 0.1})
        .select("text", "split")
        .collect()
    }
    # the r8 catastrophe exactly: every stratum of the split must be
    # populated among the sampled survivors
    assert {"train", "val", "test"} <= set(split_of.values()), set(split_of.values())

    def raw_split(t: str) -> str:
        b = raw_bucket(t)
        return "train" if b < cut80 else ("val" if b < cut90 else "test")

    agree_split = sum(
        (raw_split(t) == s) for t, s in split_of.items()
    ) / len(split_of)
    # independent: 0.8^2 + 0.1^2 + 0.1^2 = 0.66; un-salted split: 1.0
    assert agree_split < 0.85, agree_split

    # stage 3: physical shard assignment at export time
    path = str(tmp_path / "corpus")
    manifest = export_corpus(kept, path, n_shards=8)
    assert len(manifest["shards"]) == 8  # every shard populated
    shard_of = {
        r.text: r.shard
        for r in spark.read.parquet(path).select("text", "shard").collect()
    }
    agree_shard = sum(
        (shard_of[t] == raw_bucket(t) % 8) for t in shard_of
    ) / len(shard_of)
    # independent: 1/8 = 0.125; un-salted shard key: 1.0
    assert agree_shard < 0.5, agree_shard


def test_temperature_mixture_quota_math_and_determinism(spark):
    """temperature_mixture_sample: alpha=0.5 up-weights small strata
    (quota math checked against hand arithmetic), alpha=1.0 is
    proportional, picks are deterministic, and budget=0 keeps nothing."""
    from neulix_datahub_spark.operators.curation import temperature_mixture_sample

    rows = [(i, "big", f"doc {i}") for i in range(64)] + [
        (1000 + i, "small", f"rare {i}") for i in range(4)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])

    # alpha=0.5: S = sqrt(64)+sqrt(4) = 10 -> quotas 8 and 2
    kept = temperature_mixture_sample(df, budget=10, alpha=0.5)
    per = {r.lang: r.cnt for r in
           kept.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert per == {"big": 8, "small": 2}

    # alpha=1.0: proportional -> floor(10*64/68)=9, floor(10*4/68)=0
    kept1 = temperature_mixture_sample(df, budget=10, alpha=1.0)
    per1 = {r.lang: r.cnt for r in
            kept1.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert per1 == {"big": 9}

    # deterministic winners run to run
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(
        r.doc_id
        for r in temperature_mixture_sample(df, budget=10, alpha=0.5).collect()
    )
    assert a == b

    assert temperature_mixture_sample(df, budget=0).count() == 0
    import pytest

    with pytest.raises(ValueError, match="budget"):
        temperature_mixture_sample(df, budget=-1)


def test_contamination_prefilter_is_result_invariant(spark):
    """Round-9: the Bloom prefilter in benchmark_ngram_contamination
    only changes what moves, never the answer — prefiltered and
    unfiltered runs must return identical doc sets (no false negatives
    by construction; false positives die in the exact semi-join)."""
    rows = [(i, f"document number {i} with shared run w1 w2 w3 w4 w5 w6 w7 w8"
             if i % 3 == 0 else f"unrelated content {i} alpha beta gamma delta "
             f"epsilon zeta eta theta") for i in range(60)]
    train = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = spark.createDataFrame(
        [("prefix w1 w2 w3 w4 w5 w6 w7 w8 suffix",)], ["text"]
    )
    with_f = sorted(
        r.doc_id for r in
        benchmark_ngram_contamination(train, bench, prefilter_bits=1 << 12).collect()
    )
    without = sorted(
        r.doc_id for r in
        benchmark_ngram_contamination(train, bench, prefilter_bits=None).collect()
    )
    assert with_f == without == [i for i in range(60) if i % 3 == 0]


# ---------------------------------------------------------------------------
# token-budget waterfall (round 11)
# ---------------------------------------------------------------------------


def _ref_waterfall(ns, b_frac=(13, 10), c_frac=(7, 5), scale=10**6):
    """Independent ITERATIVE reference for the closed-form planner:
    repeatedly cap every source below the current water level until a
    fixed point — exact integer decisions, same fixed-point the KKT
    single-pass computes."""
    items = {
        k: (n, (n * c_frac[0]) // c_frac[1], math.floor(scale * math.sqrt(n)))
        for k, n in ns.items()
    }
    b = (sum(n for n, _, _ in items.values()) * b_frac[0]) // b_frac[1]
    capped: set = set()
    while True:
        rem = b - sum(items[k][1] for k in capped)
        w_unc = sum(w for k, (_, _, w) in items.items() if k not in capped)
        new = {
            k
            for k, (_, c, w) in items.items()
            if k not in capped and c * w_unc < rem * w
        }
        if not new:
            break
        capped |= new
    rem = b - sum(items[k][1] for k in capped)
    w_unc = sum(w for k, (_, _, w) in items.items() if k not in capped)
    out = {}
    for k, (n, c, w) in items.items():
        alloc = float(c) if k in capped else min(
            float(c), float(rem * w) / float(w_unc)
        )
        out[k] = (n, c, k in capped, round(alloc, 4), round(alloc / n, 6))
    return out


def _plan_dict(plan):
    return {
        r["source"]: (
            r["n_tokens"],
            r["cap_tokens"],
            r["capped"],
            r["alloc_tokens"],
            r["epochs"],
        )
        for r in plan.collect()
    }


def test_waterfall_two_round_cascade(spark):
    from neulix_datahub_spark.operators.curation import (
        plan_token_budget_waterfall,
    )

    # capping the tiny source frees enough budget to push the MID
    # source over its own cap in the second round — the prefix test
    # must reproduce the full cascade, not just the first pass
    ns = {"tiny": 100, "mid": 3800, "big": 5000}
    counts = spark.createDataFrame(
        list(ns.items()), "source string, n_tokens long"
    )
    got = _plan_dict(plan_token_budget_waterfall(counts, budget_frac=(13, 10)))
    want = _ref_waterfall(ns)
    assert got == want
    assert got["tiny"][2] and got["mid"][2] and not got["big"][2]
    # allocations exhaust the budget exactly
    assert round(sum(v[3] for v in got.values()), 4) == (8900 * 13) // 10


def test_waterfall_no_caps_is_proportional(spark):
    from neulix_datahub_spark.operators.curation import (
        plan_token_budget_waterfall,
    )

    ns = {"a": 4000, "b": 4100, "c": 3900}
    counts = spark.createDataFrame(
        list(ns.items()), "source string, n_tokens long"
    )
    got = _plan_dict(
        plan_token_budget_waterfall(counts, budget_frac=(1, 1))
    )
    assert not any(v[2] for v in got.values())
    assert got == _ref_waterfall(ns, b_frac=(1, 1))


def test_waterfall_infeasible_budget_clamps(spark):
    from neulix_datahub_spark.operators.curation import (
        plan_token_budget_waterfall,
    )

    ns = {"a": 1000, "b": 1000}
    counts = spark.createDataFrame(
        list(ns.items()), "source string, n_tokens long"
    )
    # budget 3x total >> 1.4x caps: every source allocates its cap,
    # the remainder stays unassigned, nothing over-allocates
    got = _plan_dict(
        plan_token_budget_waterfall(counts, budget_frac=(3, 1))
    )
    for n, cap, _, alloc, _ in got.values():
        assert alloc <= cap


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(
    ns=st.dictionaries(
        st.sampled_from(["s0", "s1", "s2", "s3", "s4", "s5"]),
        st.integers(1, 20_000),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=8, deadline=None)
def test_waterfall_matches_iterative_reference(spark, ns):
    from neulix_datahub_spark.operators.curation import (
        plan_token_budget_waterfall,
    )

    counts = spark.createDataFrame(
        list(ns.items()), "source string, n_tokens long"
    )
    got = _plan_dict(plan_token_budget_waterfall(counts, budget_frac=(13, 10)))
    assert got == _ref_waterfall(ns)


def test_waterfall_explicit_int_budget(spark):
    from neulix_datahub_spark.operators.curation import (
        plan_token_budget_waterfall,
    )

    counts = spark.createDataFrame(
        [("a", 1000), ("b", 500)], "source string, n_tokens long"
    )
    got = _plan_dict(plan_token_budget_waterfall(counts, budget=1800))
    # b caps at 1.4 epochs; the freed budget lands on a; sum == budget
    assert got["b"][2] and not got["a"][2]
    assert got["b"][3] == 700.0 and got["a"][3] == 1100.0
    import pytest

    with pytest.raises(ValueError, match="exactly one"):
        plan_token_budget_waterfall(counts)
    with pytest.raises(ValueError, match="exactly one"):
        plan_token_budget_waterfall(counts, budget=5, budget_frac=(1, 1))


def test_epoch_materialization_multiplicities_and_bound(spark):
    """Every document appears exactly q or q+1 times (q = full epochs of
    its source); the emitted token total never exceeds the allocation
    and undershoots by less than one document; re-runs are identical."""
    from neulix_datahub_spark.operators.curation import (
        materialize_epoch_plan,
        plan_token_budget_waterfall,
    )

    docs = spark.createDataFrame(
        [
            (i, "s0" if i < 6 else "s1", " ".join(f"w{i}x{j}" for j in range(3 + i % 4)))
            for i in range(12)
        ],
        "doc_id long, source string, text string",
    )
    toks = F.size(F.split(F.col("text"), " "))
    counts = docs.groupBy("source").agg(F.sum(toks).cast("long").alias("n_tokens"))
    plan = plan_token_budget_waterfall(counts, budget_frac=(17, 10))
    mat = materialize_epoch_plan(docs, plan)

    per_doc = {
        (r["source"], r["doc_id"]): r["count"]
        for r in mat.groupBy("source", "doc_id").count().collect()
    }
    plan_rows = {r["source"]: r for r in plan.collect()}
    import math

    for (src, _), c in per_doc.items():
        q = math.floor(plan_rows[src]["alloc_tokens"] / plan_rows[src]["n_tokens"])
        assert c in (q, q + 1), (src, c, q)

    per_src = {
        r["source"]: r["sum(n_doc_tokens)"]
        for r in mat.groupBy("source").agg(F.sum("n_doc_tokens")).collect()
    }
    doc_toks = {
        r["source"]: r["m"]
        for r in docs.groupBy("source").agg(F.max(toks).alias("m")).collect()
    }
    for src, emitted in per_src.items():
        alloc = plan_rows[src]["alloc_tokens"]
        assert emitted <= alloc
        assert alloc - emitted < doc_toks[src] + 1

    again = materialize_epoch_plan(docs, plan)
    assert sorted(map(tuple, mat.collect())) == sorted(
        map(tuple, again.collect())
    )
