

def test_gopher_rules_discriminate(sf_dir):
    """Every planted enrichment is visible in its rule counter and the
    keep flag actually partitions the corpus (not all-pass/all-fail)."""
    from gamechanger_data_ray.pipelines.analysis_queries import docs_quality_gopher

    out = docs_quality_gopher(sf_dir).set_index("doc_id")
    assert 0 < out["keep"].sum() < len(out)
    assert (out.loc[out.index % 7 == 0, "n_bullet_lines"] == 2).all()
    # %11's digit suffix appends to the same line, un-ending the ellipsis
    assert (out.loc[(out.index % 5 == 0) & (out.index % 11 != 0),
                    "n_ellipsis_lines"] >= 1).all()
    assert (out.loc[out.index % 3 == 0, "n_symbols"] >= 4).all()
    assert (out.loc[(out.index % 3 != 0) & (out.index % 5 != 0),
                    "n_symbols"] == 0).all()
    # the word-count floor is the binding rule on this corpus
    assert (out.loc[out["keep"] == 1, "n_words"] >= 50).all()


def test_c4_rules_discriminate(sf_dir):
    """Each planted line exercises its C4 rule: the no-punct base line
    always drops, the proper line survives, short/javascript lines drop,
    lorem/brace pages drop entirely."""
    from gamechanger_data_ray.pipelines.analysis_queries import docs_c4_clean

    out = docs_c4_clean(sf_dir).set_index("doc_id")
    assert 0 < out["keep"].sum() < len(out)
    import hashlib
    empty = hashlib.md5(b"").hexdigest()
    proper = hashlib.md5(b"This line ends properly.").hexdigest()
    # doc with NO enrichment: base line has no terminal punct -> all drop
    plain = out[(out.index % 4 != 0) & (out.index % 8 != 0) & (out.index % 6 != 0)
                & (out.index % 9 != 0) & (out.index % 10 != 0)]
    assert (plain["n_kept"] == 0).all() and (plain["clean_md5"] == empty).all()
    assert (plain["keep"] == 0).all()
    # %4-only docs keep exactly the proper line
    only4 = out[(out.index % 4 == 0) & (out.index % 8 != 0) & (out.index % 6 != 0)
                & (out.index % 9 != 0) & (out.index % 10 != 0)]
    assert (only4["n_kept"] == 1).all() and (only4["clean_md5"] == proper).all()
    assert (only4["keep"] == 1).all()
    # lorem / brace pages always drop regardless of kept lines
    assert (out.loc[out.index % 9 == 0, "keep"] == 0).all()
    assert (out.loc[out.index % 10 == 0, "keep"] == 0).all()
