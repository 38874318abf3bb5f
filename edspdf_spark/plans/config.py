"""Config-driven pipeline assembly — the reference's registry/config
surface (SURVEY.md §1.4; /root/reference/edspdf/registry.py:218-225,
pipeline.py:453-544) mapped onto this engine.

The reference instantiates pipes from an INI/TOML config with a
`pipeline` list and per-component `components.<name>` sections, e.g.:

    [pipeline]
    pipeline = ["extractor", "classifier", "aggregator"]

    [components.extractor]
    factory = "pdfminer-extractor"
    extract_style = true

    [components.classifier]
    factory = "mask-classifier"
    x0 = 0.1
    y0 = 0.1
    x1 = 0.9
    y1 = 0.9
    threshold = 0.1

    [components.aggregator]
    factory = "simple-aggregator"
    new_line_threshold = 0.2
    new_paragraph_threshold = 1.5

Here a pipeline is one PipelineConfig consumed by the fused map, so
`load_config` folds the recognized factories into that value object.
Unknown factories raise (same contract as the reference registry's
"unknown function" error, registry.py:127-154). TOML parsing is
stdlib tomllib; plain dicts are accepted for programmatic use.

Reference interpolation: `${components.embedding}`-style values
resolve to the object at that dotted path of the root config, exactly
the sharing mechanism the reference's confit Config.resolve provides
(pipeline.py:498-544; used by tests/recipes/config.cfg:37 to share one
embedding between components). Whole-value references only — the
engine has no use for string splicing. `@factory` (reference spelling)
and `factory` are both accepted.

Embedding components (`box-layout-embedding`, `simple-text-embedding`,
`embedding-combiner` — the torch-free §2.7 stack in
operators/embeddings.py) parse into `PipelineConfig.embedding_spec`,
a nested spec that operators.embeddings.embed_from_spec turns into
DataFrame column stages. Torch-only factories (box-transformer,
sub-box-cnn-pooler, huggingface-embedding) raise a clear error.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Union

from ..operators.fused import PipelineConfig

_EXTRACTOR_FACTORIES = {"pdfminer-extractor"}
_CLASSIFIER_FACTORIES = {"mask-classifier", "multi-mask-classifier",
                         "dummy-classifier"}
_AGGREGATOR_FACTORIES = {"simple-aggregator", "markdown-aggregator"}
_EMBEDDING_FACTORIES = {"box-layout-embedding", "simple-text-embedding",
                        "embedding-combiner", "huggingface-embedding"}
_TORCH_ONLY_FACTORIES = {"box-transformer", "sub-box-cnn-pooler"}

_REF_RE = re.compile(r"^\$\{([A-Za-z0-9_.\-]+)\}$")


class ConfigError(ValueError):
    pass


def _path_get(root: Dict, dotted: str):
    node: Any = root
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            raise ConfigError(f"config reference '${{{dotted}}}' does not "
                              f"resolve (missing '{part}')")
        node = node[part]
    return node


def resolve_references(cfg: Dict) -> Dict:
    """Resolve `${dotted.path}` string values against the root config.

    The referenced object is SHARED (not copied), matching the
    reference semantics where `embedding = ${components.embedding}`
    makes two pipes hold the same component. Chained references
    resolve transitively; cycles raise."""
    def resolve_value(v, stack):
        if isinstance(v, str):
            m = _REF_RE.match(v)
            if m:
                path = m.group(1)
                if path in stack:
                    raise ConfigError(
                        f"config reference cycle: {' -> '.join(stack)} "
                        f"-> {path}")
                target = _path_get(cfg, path)
                return resolve_value(target, stack + (path,))
        return v

    def walk(node, stack):
        if isinstance(node, dict):
            for k, v in list(node.items()):
                r = resolve_value(v, stack)
                node[k] = walk(r, stack) if isinstance(r, (dict, list)) \
                    and r is v else r
        elif isinstance(node, list):
            for i, v in enumerate(node):
                r = resolve_value(v, stack)
                node[i] = walk(r, stack) if isinstance(r, (dict, list)) \
                    and r is v else r
        return node

    return walk(cfg, ())


def parse_embedding_spec(comp: Dict, name: str = "embedding",
                         _seen: Optional[set] = None) -> Dict:
    """Nested component dict -> embedding spec consumed by
    operators.embeddings.embed_from_spec. Sub-tables with a factory key
    become nested encoder specs (the reference nests encoders the same
    way, tests/core/config.cfg)."""
    if _seen is None:
        _seen = set()
    if id(comp) in _seen:
        raise ConfigError(
            f"embedding component cycle detected at '{name}' (a "
            "${...} reference made a component its own descendant)")
    _seen = _seen | {id(comp)}
    comp = dict(comp)
    factory = comp.pop("@factory", None) or comp.pop("factory", None)
    if factory in _TORCH_ONLY_FACTORIES:
        raise ConfigError(
            f"factory '{factory}' for '{name}' needs torch, which is not "
            "available in this engine build; use the torch-free stack "
            f"({sorted(_EMBEDDING_FACTORIES)})")
    if factory not in _EMBEDDING_FACTORIES:
        raise ConfigError(f"unknown embedding factory '{factory}' for "
                          f"'{name}' (known: {sorted(_EMBEDDING_FACTORIES)})")
    spec: Dict = {"factory": factory}
    encoders = {}
    for k, v in comp.items():
        if isinstance(v, dict) and ("factory" in v or "@factory" in v):
            encoders[k] = parse_embedding_spec(v, name=f"{name}.{k}",
                                               _seen=_seen)
        else:
            spec[k] = v
    if encoders:
        spec["encoders"] = encoders
    if factory == "embedding-combiner" and not encoders:
        raise ConfigError(f"embedding-combiner '{name}' needs at least one "
                          "nested encoder table")
    return spec


def load_config(source: Union[str, Dict]) -> PipelineConfig:
    """source: path to a .toml file, a TOML string, or a parsed dict."""
    if isinstance(source, dict):
        # deep-copy: reference resolution mutates in place (swapping
        # '${...}' strings for shared sub-objects), which must not be
        # an observable side effect on the caller's dict
        import copy

        cfg = copy.deepcopy(source)
    else:
        import os

        import tomllib

        # a path is a single line naming an existing file; anything
        # else (including TOML that opens with comments) parses as text
        if "\n" not in source and os.path.exists(source):
            with open(source, "rb") as f:
                cfg = tomllib.load(f)
        else:
            cfg = tomllib.loads(source)

    cfg = resolve_references(cfg)
    try:
        order: List[str] = cfg["pipeline"]["pipeline"]
        components: Dict[str, Dict] = cfg["components"]
    except KeyError as exc:
        raise ConfigError(f"config requires [pipeline].pipeline and "
                          f"[components.*] sections: missing {exc}") from exc

    out = PipelineConfig()
    for name in order:
        if name not in components:
            raise ConfigError(f"pipeline lists '{name}' but "
                              f"[components.{name}] is missing")
        comp = dict(components[name])
        factory = comp.pop("@factory", None) or comp.pop("factory", None)
        if factory in _EMBEDDING_FACTORIES or factory in _TORCH_ONLY_FACTORIES:
            out.embedding_spec = parse_embedding_spec(
                {"factory": factory, **comp}, name=name)
            comp = {}
        elif factory == "trainable-classifier":
            emb = comp.pop("embedding", None)
            if isinstance(emb, dict):
                out.embedding_spec = parse_embedding_spec(
                    emb, name=f"{name}.embedding")
            comp.pop("labels", None)
            comp.pop("activation", None)
        elif factory in _EXTRACTOR_FACTORIES:
            out.extract_style = bool(comp.pop("extract_style", False))
            comp.pop("raise_on_error", None)
        elif factory == "mask-classifier":
            # single mask labeled body (mask.py:7-82)
            mask = (comp.pop("page_num", None), float(comp.pop("x0")),
                    float(comp.pop("x1")), float(comp.pop("y0")),
                    float(comp.pop("y1")), str(comp.pop("label", "body")))
            # reference mask order: (page, x0, x1, y0, y1, label)
            out.masks = [mask]
            out.threshold = float(comp.pop("threshold", 1.0))
        elif factory == "multi-mask-classifier":
            out.threshold = float(comp.pop("threshold", 1.0))
            masks = []
            # tomllib preserves table declaration order, and mask order
            # IS priority (first-max-wins argmax) — never sort it
            for mname, m in list(comp.items()):
                if not isinstance(m, dict):
                    raise ConfigError(
                        f"multi-mask-classifier entry '{mname}' must be a "
                        f"table with x0/y0/x1/y1/label")
                masks.append((m.get("page_num"), float(m["x0"]),
                              float(m["x1"]), float(m["y0"]),
                              float(m["y1"]), str(m.get("label", mname))))
            out.masks = masks
            comp = {}
        elif factory == "dummy-classifier":
            label = str(comp.pop("label", "body"))
            # catch-all mask with the requested label == constant label
            out.masks = [(None, -10000.0, 10000.0, -10000.0, 10000.0, label)]
            out.threshold = 0.0
        elif factory in _AGGREGATOR_FACTORIES:
            out.sort = bool(comp.pop("sort", False))
            out.new_line_threshold = float(comp.pop("new_line_threshold",
                                                    0.2))
            out.new_paragraph_threshold = float(
                comp.pop("new_paragraph_threshold", 1.5))
            lm = comp.pop("label_map", None)
            out.label_map = dict(lm) if lm else None
            out.markdown = factory == "markdown-aggregator"
            if out.markdown:
                out.extract_style = True
        else:
            raise ConfigError(
                f"unknown factory '{factory}' for component '{name}' "
                f"(known: {sorted(_EXTRACTOR_FACTORIES | _CLASSIFIER_FACTORIES | _AGGREGATOR_FACTORIES)})")
        if comp:
            raise ConfigError(
                f"unrecognized options for '{name}' ({factory}): "
                f"{sorted(comp)}")
    return out
