"""End-to-end curation DAG invariants: the composed pipeline drops the
planted exact and near duplicates, excises shared passages, and every
survivor clears the quality gate. (Each stage's VALUES are SQL-oracled
via its own registry entry; these tests pin the composition.)"""

import pytest
from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.queries_pipeline import q_curation_pipeline

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark):
    rows = q_curation_pipeline(spark, SF_DIR).collect()
    from icdar_2019_rrc_sroie_spark.operators.indexes import (
        release_indexes,
    )

    release_indexes()
    return rows


def test_exact_copies_never_survive(result):
    # the +1M shifted copies lose the min-id rule deterministically
    assert not [r for r in result
                if 1_000_000 <= r["doc_id"] < 2_000_000]


def test_near_copies_mostly_removed(result):
    # +2M near-copies (one appended token) must be caught by the LSH
    # cluster stage; 4-hash/2-band MinHash is probabilistic per doc
    # (deterministic given the data), so allow a small fixed miss rate
    survivors = [r for r in result if r["doc_id"] >= 2_000_000]
    assert len(survivors) <= 5, survivors


def test_survivors_clear_quality_gate(result):
    assert result, "pipeline should keep something"
    assert all(r["n_tokens"] >= 10 for r in result)


def test_doc_ids_distinct_and_ordered(result):
    ids = [r["doc_id"] for r in result]
    assert ids == sorted(ids) and len(ids) == len(set(ids))


def test_excised_docs_have_changed_fingerprint(spark, result):
    """Docs with excised spans must carry a curated_fp different from
    their original canonical-text md5."""
    excised = {r["doc_id"]: r["curated_fp"] for r in result
               if r["n_excised"] > 0}
    if not excised:
        pytest.skip("no surviving doc had excised spans at this sf")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    orig = {
        r["doc_id"]: r["fp"]
        for r in docs.filter(F.col("doc_id").isin(list(excised)))
        .select("doc_id", F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))),
                             r"\s+", " ")).alias("fp"))
        .collect()
    }
    for doc_id, fp in excised.items():
        if doc_id in orig:
            assert fp != orig[doc_id]


def test_langid_trigram_classifies_decorated_corpus(spark):
    """The corpus-trained char-trigram profiles must actually separate
    the five decorated languages (not just run): exact accuracy on the
    deterministic corpus."""
    from pyspark.sql import functions as F

    from icdar_2019_rrc_sroie_spark.operators.indexes import (
        release_indexes,
    )
    from icdar_2019_rrc_sroie_spark.queries import q_langid_trigram

    out = q_langid_trigram(spark, SF_DIR)
    acc = out.agg(F.avg("correct")).collect()[0][0]
    release_indexes()
    assert acc >= 0.95, acc
