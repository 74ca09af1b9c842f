"""Every module imports cleanly (catches dead imports / syntax rot)."""

import importlib
import pkgutil

import gvfdiffusion_tpu


def test_import_all_modules():
    failures = []
    for mod in pkgutil.walk_packages(
        gvfdiffusion_tpu.__path__, prefix="gvfdiffusion_tpu."
    ):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # pragma: no cover
            failures.append((mod.name, repr(e)))
    assert not failures, failures
