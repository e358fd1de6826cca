"""Registry hygiene: no query/oracle key may be defined in two ops modules
(a later module would silently SHADOW the earlier implementation and its
oracle — the driver would then verify only the survivor)."""


def test_no_duplicate_query_keys():
    from rindex.ops import registry

    seen: dict[str, str] = {}
    dups = []
    for m in registry._modules():
        for k in getattr(m, "QUERIES", {}):
            if k in seen:
                dups.append((k, seen[k], m.__name__))
            seen[k] = m.__name__
    assert not dups, f"shadowed query keys: {dups}"


def test_every_oracle_has_a_query():
    from rindex.ops import registry

    for m in registry._modules():
        q = set(getattr(m, "QUERIES", {}))
        o = set(getattr(m, "ORACLE", {}))
        orphans = o - q
        assert not orphans, f"{m.__name__}: oracles without queries {orphans}"


def test_sample_window_is_oracle_backed():
    """The driver samples the FIRST 50 registry entries; every one must be
    oracle-backed (a rows-only op in the window burns a slot as
    no_oracle — the r3 verdict's hygiene item)."""
    from rindex.ops import registry

    Q, O = {}, {}
    for m in registry._modules():
        Q.update(getattr(m, "QUERIES", {}))
        O.update(getattr(m, "ORACLE", {}))
    head = [k for k in registry._SAMPLE_FIRST if k in Q][:50]
    assert len(head) == 50
    missing = [k for k in head if k not in O]
    assert not missing, f"rows-only ops inside the sample window: {missing}"
