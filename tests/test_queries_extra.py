

def test_x127_removal_effect_invariants(spark, sf_dir):
    """Removing a channel can only REMOVE conversion mass (flows
    redirect to NULL, nothing is renormalized), so every removed-
    scenario conversion is <= the full one and each effect sits in
    [0, 1e6]. The 'error' channel exists on every path type, so at
    least one channel must carry a strictly positive effect."""
    from etlp_spark.queries import QUERIES

    rows = QUERIES["x127_removal_effect_attribution"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    full = rows[0].conv_full_e6
    assert all(r.conv_full_e6 == full for r in rows)
    for r in rows:
        assert 0 <= r.conv_removed_e6 <= full, r
        assert 0 <= r.removal_effect_e6 <= 1_000_000, r
    assert any(r.removal_effect_e6 > 0 for r in rows)
