"""Config reference interpolation (${components.x}) + embedding
component wiring — reference pipeline.py:498-544 and
tests/recipes/config.cfg:37 semantics."""

import numpy as np
import pytest

from edspdf_spark.plans.config import (ConfigError, load_config,
                                       parse_embedding_spec,
                                       resolve_references)


def test_resolve_references_shares_object():
    cfg = {
        "components": {
            "embedding": {"factory": "box-layout-embedding", "size": 24},
            "classifier": {"factory": "trainable-classifier",
                           "embedding": "${components.embedding}"},
        },
    }
    out = resolve_references(cfg)
    assert out["components"]["classifier"]["embedding"] is \
        out["components"]["embedding"]


def test_load_config_does_not_mutate_caller_dict():
    """Dict sources are deep-copied before reference resolution: the
    caller's '${...}' strings must survive load_config."""
    import copy

    from edspdf_spark.plans.config import load_config

    cfg = {
        "pipeline": {"pipeline": ["classifier"]},
        "components": {
            "embedding": {"@factory": "box-layout-embedding", "size": 24},
            "classifier": {"@factory": "trainable-classifier",
                           "labels": [],
                           "embedding": "${components.embedding}"},
        },
    }
    before = copy.deepcopy(cfg)
    load_config(cfg)
    assert cfg == before
    assert cfg["components"]["classifier"]["embedding"] == \
        "${components.embedding}"


def test_resolve_references_chain_and_errors():
    cfg = {"a": "${b}", "b": "${c}", "c": 42}
    assert resolve_references(cfg)["a"] == 42
    with pytest.raises(ConfigError, match="does not resolve"):
        resolve_references({"a": "${missing.path}"})
    with pytest.raises(ConfigError, match="cycle"):
        resolve_references({"a": "${b}", "b": "${a}"})


def test_load_config_reference_style_embedding():
    """Mirrors the reference recipes/config.cfg shape: a trainable
    classifier whose embedding references a shared component."""
    cfg = {
        "pipeline": {"pipeline": ["extractor", "classifier"]},
        "components": {
            "extractor": {"@factory": "pdfminer-extractor"},
            "embedding": {
                "@factory": "embedding-combiner",
                "mode": "sum",
                "layout_encoder": {"@factory": "box-layout-embedding",
                                   "size": 12, "n_positions": 16},
                "text_encoder": {"@factory": "simple-text-embedding",
                                 "size": 12},
            },
            "classifier": {"@factory": "trainable-classifier",
                           "labels": [],
                           "embedding": "${components.embedding}"},
        },
    }
    pc = load_config(cfg)
    spec = pc.embedding_spec
    assert spec["factory"] == "embedding-combiner"
    assert set(spec["encoders"]) == {"layout_encoder", "text_encoder"}
    assert spec["encoders"]["layout_encoder"]["size"] == 12


def test_torch_only_factory_raises():
    with pytest.raises(ConfigError, match="needs torch"):
        parse_embedding_spec({"@factory": "box-transformer", "n_layers": 1})


def test_huggingface_embedding_spec_wires_operator(spark):
    """'huggingface-embedding' is a first-class embedding factory:
    spec-driven wiring equals a direct hf_line_embed call."""
    from edspdf_spark import synth
    from edspdf_spark.operators import blocs, extract
    from edspdf_spark.operators.embeddings import embed_from_spec
    from edspdf_spark.operators.hf_embedding import hf_line_embed

    spec = parse_embedding_spec(
        {"@factory": "huggingface-embedding", "size": 4,
         "window": 24, "stride": 12, "line_pooling": "mean"})
    bl = blocs(extract(synth.pages_spark(spark, 6))).select(
        "url", "page_num", "order_idx", "text")
    via_spec, size = embed_from_spec(bl, spec, prefix="e")
    assert size == 4
    direct = hf_line_embed(bl, dim=4, window=24, stride=12,
                           out_prefix="e")
    key = ["url", "page_num", "order_idx"]
    a = sorted(tuple(r) for r in via_spec.select(
        *key, *[f"e{c}" for c in range(4)]).collect())
    b = sorted(tuple(r) for r in direct.select(
        *key, *[f"e{c}" for c in range(4)]).collect())
    assert a == b and len(a) > 20


def test_embedding_spec_dict_cycle_raises():
    """Mutually-referencing component dicts (each reference resolves in
    one string hop, so the string-cycle check can't see it) must raise,
    not recurse forever."""
    a = {"factory": "embedding-combiner", "mode": "sum"}
    b = {"factory": "embedding-combiner", "mode": "sum", "inner": a}
    a["inner"] = b
    with pytest.raises(ConfigError, match="cycle"):
        parse_embedding_spec(a)


def test_embed_spec_encoders_keep_declaration_order(spark):
    """'cat' concatenates encoders in DECLARATION order (reference
    combiner iterates children in insertion order) — never sorted."""
    from edspdf_spark.operators.embeddings import embed_from_spec

    df = spark.createDataFrame(
        [("u", 0, 1, 0.1, 0.2, 0.1, 0.2)],
        "url string, page_num int, num_pages int, x0 double, x1 double,"
        " y0 double, y1 double")
    # 'z_first' sorts after 'a_second' alphabetically; declaration wins
    spec = {"factory": "embedding-combiner", "mode": "cat",
            "encoders": {
                "z_first": {"factory": "box-layout-embedding", "size": 12,
                            "n_positions": 16},
                "a_second": {"factory": "box-layout-embedding", "size": 24,
                             "n_positions": 16},
            }}
    out, size = embed_from_spec(df, spec)
    assert size == 36
    row = out.collect()[0]
    from edspdf_spark.operators.embeddings import box_layout_embed
    first = box_layout_embed(df, size=12, n_positions=16).collect()[0]
    assert [row[f"e{c}"] for c in range(12)] == \
        [first[f"b{c}"] for c in range(12)]


def test_embed_from_spec_combiner_sum_matches_manual(spark):
    from edspdf_spark.operators.embeddings import (box_layout_embed,
                                                   build_text_vocabs,
                                                   embed_from_spec,
                                                   text_embed_weights,
                                                   text_token_embed)

    vocabs = build_text_vocabs(["alpha beta", "gamma"])
    weights = text_embed_weights(vocabs, dim=12, seed=3)
    df = spark.createDataFrame(
        [("u", 0, 0, 2, 0.2, 0.5, 0.3, 0.35, "alpha gamma")],
        "url string, order_idx int, page_num int, num_pages int, x0 double,"
        " x1 double, y0 double, y1 double, text string")
    spec = {
        "factory": "embedding-combiner", "mode": "sum",
        "encoders": {
            "layout": {"factory": "box-layout-embedding", "size": 12,
                       "n_positions": 16},
            "text": {"factory": "simple-text-embedding", "size": 12},
        },
    }
    out, size = embed_from_spec(df, spec, vocabs, weights)
    assert size == 12
    row = out.collect()[0]
    manual_box = box_layout_embed(df, size=12, n_positions=16).collect()[0]
    manual_txt = text_token_embed(df, vocabs, weights).collect()[0]
    for c in range(12):
        assert row[f"e{c}"] == manual_box[f"b{c}"] + float(manual_txt[f"t{c}"])


def test_embed_from_spec_cat_sizes(spark):
    from edspdf_spark.operators.embeddings import embed_from_spec

    df = spark.createDataFrame(
        [("u", 0, 1, 0.1, 0.2, 0.1, 0.2)],
        "url string, page_num int, num_pages int, x0 double, x1 double,"
        " y0 double, y1 double")
    spec = {"factory": "embedding-combiner", "mode": "cat",
            "encoders": {
                "a": {"factory": "box-layout-embedding", "size": 12,
                      "n_positions": 16},
                "b": {"factory": "box-layout-embedding", "size": 24,
                      "n_positions": 16},
            }}
    out, size = embed_from_spec(df, spec)
    assert size == 36
    assert [f"e{c}" in out.columns for c in range(36)] == [True] * 36
