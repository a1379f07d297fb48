

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
