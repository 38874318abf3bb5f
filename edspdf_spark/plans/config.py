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
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

from ..operators.fused import PipelineConfig

_EXTRACTOR_FACTORIES = {"pdfminer-extractor"}
_CLASSIFIER_FACTORIES = {"mask-classifier", "multi-mask-classifier",
                         "dummy-classifier"}
_AGGREGATOR_FACTORIES = {"simple-aggregator", "markdown-aggregator"}


class ConfigError(ValueError):
    pass


def load_config(source: Union[str, Dict]) -> PipelineConfig:
    """source: path to a .toml file, a TOML string, or a parsed dict."""
    if isinstance(source, dict):
        cfg = source
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
        factory = comp.pop("factory", None)
        if factory in _EXTRACTOR_FACTORIES:
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
