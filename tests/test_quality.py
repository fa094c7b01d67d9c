"""Static-quality gates (analogue of the reference's Aqua.jl/JET.jl checks,
test/test_with_aqua.jl, test_with_jet.jl): every module compiles, the public
API resolves, and no module leaks syntax/NameError-level breakage."""

import compileall
import importlib
import pathlib
import pkgutil

import tci_tpu


def test_all_modules_import():
    root = pathlib.Path(tci_tpu.__file__).parent
    for modinfo in pkgutil.walk_packages([str(root)], prefix="tci_tpu."):
        importlib.import_module(modinfo.name)


def test_bytecode_compiles():
    root = pathlib.Path(tci_tpu.__file__).parent
    assert compileall.compile_dir(str(root), quiet=2, force=True)


def test_public_api_resolves():
    for name in tci_tpu.__all__:
        assert getattr(tci_tpu, name, None) is not None, name


def test_no_mutable_default_args():
    """Guard against the classic shared-mutable-default bug in the public
    API functions."""
    import inspect

    for name in tci_tpu.__all__:
        obj = getattr(tci_tpu, name)
        if not callable(obj) or isinstance(obj, type):
            continue
        try:
            sig = inspect.signature(obj)
        except (TypeError, ValueError):
            continue
        for p in sig.parameters.values():
            assert not isinstance(p.default, (list, dict, set)), (
                f"{name}.{p.name} has a mutable default"
            )
