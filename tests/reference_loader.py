"""Load the reference's pure-numpy modules (structures, alignment,
simple aggregator, mask classifier) directly from /root/reference for
DIFFERENTIAL testing, without its heavy dependencies.

The real package __init__ pulls torch/catalogue/confit (absent here),
so this loader fabricates a minimal `edspdf` package namespace and
stubs `confit.Config` and the registry decorator, then executes the
reference modules verbatim from their files. Nothing is copied into
this repo — the reference code runs as the oracle, exactly the
differential strategy SURVEY.md §5 prescribes.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference/edspdf"


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    """Returns a namespace with structures / align_box_labels /
    SimpleAggregator / MaskClassifier from the reference, or raises
    ImportError if the reference checkout is unavailable."""
    if "edspdf.pipes.aggregators.simple" in sys.modules:
        return _ns()

    if "confit" not in sys.modules:
        confit = types.ModuleType("confit")

        class Config(dict):
            def resolve(self, *a, **k):
                return self

        confit.Config = Config
        sys.modules["confit"] = confit

    pkg = types.ModuleType("edspdf")
    pkg.__path__ = [REF]
    sys.modules["edspdf"] = pkg

    reg_mod = types.ModuleType("edspdf.registry")

    class _Factory:
        def register(self, _name=None, **_kw):
            def deco(obj):
                return obj

            return deco

    class _Registry:
        factory = _Factory()
        misc = _Factory()
        adapter = _Factory()

    reg_mod.registry = _Registry()
    sys.modules["edspdf.registry"] = reg_mod

    structures = _load("edspdf.structures", f"{REF}/structures.py")
    pkg.structures = structures
    for n in ("Box", "Page", "PDFDoc", "Text", "TextBox", "TextProperties"):
        setattr(pkg, n, getattr(structures, n))
    pkg.registry = reg_mod.registry
    pkg.Pipeline = type("Pipeline", (), {})

    utils_pkg = types.ModuleType("edspdf.utils")
    utils_pkg.__path__ = [f"{REF}/utils"]
    sys.modules["edspdf.utils"] = utils_pkg
    _load("edspdf.utils.collections", f"{REF}/utils/collections.py")
    _load("edspdf.utils.alignment", f"{REF}/utils/alignment.py")

    for sub in ("pipes", "pipes.aggregators", "pipes.classifiers"):
        m = types.ModuleType(f"edspdf.{sub}")
        m.__path__ = [f"{REF}/{sub.replace('.', '/')}"]
        sys.modules[f"edspdf.{sub}"] = m
    _load("edspdf.pipes.aggregators.simple",
          f"{REF}/pipes/aggregators/simple.py")
    _load("edspdf.pipes.classifiers.mask",
          f"{REF}/pipes/classifiers/mask.py")
    return _ns()


def _ns():
    return types.SimpleNamespace(
        structures=sys.modules["edspdf.structures"],
        alignment=sys.modules["edspdf.utils.alignment"],
        simple=sys.modules["edspdf.pipes.aggregators.simple"],
        mask=sys.modules["edspdf.pipes.classifiers.mask"],
    )
