

def test_unicode_health_detects_injected_damage(spark):
    """The clean corpus correctly reports zeros; the detector itself
    is pinned on injected damage: replacement chars, control bytes,
    and the UTF-8-as-Latin-1 mojibake signature each flag their doc
    and only theirs."""
    from monasca_aggregator_spark.plans.textops import (
        q_text_unicode_health,
    )

    rows = [
        (1, "perfectly clean prose with nothing wrong", "en", "s", 40),
        (2, "decode failure marker � right here", "en", "s", 30),
        (3, "binary leak\x01\x02 in the middle", "en", "s", 25),
        (4, "mojibake cafÃ© classic double-encode", "en", "s", 35),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import monasca_aggregator_spark.plans.textops as T_

    orig = T_.load_table
    T_.load_table = lambda *_a, **_k: docs
    try:
        out = q_text_unicode_health(spark, "unused").collect()[0]
    finally:
        T_.load_table = orig
    assert out.n_docs == 4
    assert out.n_replacement == 1
    assert out.n_control == 1
    assert out.n_mojibake == 1
    assert abs(out.affected_frac - 0.75) < 1e-9
