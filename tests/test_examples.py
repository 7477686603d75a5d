"""Smoke tests for the examples/ scripts (NOIZE_EXAMPLE_FAST=1 sizes).

The examples are the documented user journeys (README, docs/API.md); these
tests execute each end-to-end at shrunken sizes so refactors can't silently
rot them.  Reference analog: the BasicDemo~ sample scene is the reference's
only end-to-end fixture (SURVEY §4).
"""

import importlib.util
import pathlib

EXAMPLES = pathlib.Path(__file__).resolve().parents[1] / "examples"


def _load(name, monkeypatch):
    # FAST is read at module import, so the env var must be set before exec
    monkeypatch.setenv("NOIZE_EXAMPLE_FAST", "1")
    spec = importlib.util.spec_from_file_location(
        f"examples_{name}", EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.FAST
    return mod


def test_full_tile_workflow(tmp_path, monkeypatch):
    mod = _load("full_tile_workflow", monkeypatch)
    mod.main(str(tmp_path / "full_tile"))
    out = tmp_path / "full_tile"
    assert (out / "saves").is_dir()
    assert list(out.glob("*.png")), "drawers exported no images"


def test_serving_tiles(tmp_path, monkeypatch):
    mod = _load("serving_tiles", monkeypatch)
    mod.main(str(tmp_path / "serving"))
    obj = tmp_path / "serving" / "tile_1_0.obj"
    assert obj.is_file() and obj.stat().st_size > 0


def test_multichip_field(tmp_path, monkeypatch):
    mod = _load("multichip_field", monkeypatch)
    mod.main(ckpt_dir=str(tmp_path / "sharded_ckpt"))
