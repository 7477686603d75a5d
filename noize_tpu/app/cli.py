"""CLI — run pipelines from JSON configs and dump PNG/NPY outputs.

The reference's interactive entry points are Unity scenes + the editor
visualizer; the framework-native equivalent is a config-driven command
line (SURVEY.md §7.8):

    python -m noize_tpu.app.cli run config.json -o out/
    python -m noize_tpu.app.cli demo -o out/           # README example #1
    python -m noize_tpu.app.cli erode config.json -o out/ --cycles 10

Config format (mirrors the ScriptableObject assets):

    {
      "resolution": 512, "xpos": 0, "zpos": 0,
      "stages": [
        {"stage": "NoiseStage", "noiseType": "Simplex", "octaves": 13,
         "hurst": 0.4, "noiseSize": 1700},
        {"stage": "StageGaussianBlur", "sigma": "s1d00", "width": 5,
         "iterations": 17},
        {"stage": "FlowMapStage", "iterations": 5}
      ]
    }
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from ..core.stageio import GeneratorData
from ..pipeline import stages as S
from ..pipeline.driver import Pipeline
from . import visualize as viz

STAGE_TYPES = {
    name: getattr(S, name)
    for name in (
        "NoiseStage", "KernelFilterStage", "StageGaussianBlur",
        "StageSmoothBlur", "StageThermalErosion", "ConstantStage",
        "CurveStage", "FlowMapStage", "WriteGeneratorContextStage",
        "ReadGeneratorContextStage",
    )
}


def build_pipeline(cfg: dict, state_manager=None) -> Pipeline:
    stages = []
    for sc in cfg["stages"]:
        sc = dict(sc)
        kind = sc.pop("stage")
        if kind not in STAGE_TYPES:
            raise SystemExit(
                f"unknown stage {kind!r}; available: {sorted(STAGE_TYPES)}"
            )
        if kind == "CurveStage" and "curve" in sc:
            sc["curve"] = tuple(float(v) for v in sc["curve"])
        stages.append(STAGE_TYPES[kind](**sc))
    return Pipeline(stages, state_manager=state_manager, name=cfg.get("name", "cli"))


DEMO_CONFIG = {
    "name": "readme_example_1",
    "resolution": 512,
    "stages": [
        {"stage": "NoiseStage", "noiseType": "Simplex", "octaves": 13,
         "hurst": 0.4, "noiseSize": 1700},
        {"stage": "StageGaussianBlur", "sigma": "s1d00", "width": 5,
         "iterations": 17},
        {"stage": "FlowMapStage", "iterations": 5},
    ],
}


def _run(cfg: dict, outdir: str, tag: str):
    os.makedirs(outdir, exist_ok=True)
    pipe = build_pipeline(cfg)
    t0 = time.perf_counter()
    out = pipe.run(GeneratorData(
        uuid=tag,
        resolution=int(cfg.get("resolution", 512)),
        xpos=int(cfg.get("xpos", 0)),
        zpos=int(cfg.get("zpos", 0)),
    ))
    dt = (time.perf_counter() - t0) * 1e3
    arr = np.asarray(out.data)
    npy = os.path.join(outdir, f"{tag}.npy")
    png = os.path.join(outdir, f"{tag}.png")
    np.save(npy, arr)
    viz.to_png(png, arr)
    print(f"{tag}: {arr.shape} in {dt:.1f}ms -> {npy}, {png}")
    return arr


def main(argv=None):
    ap = argparse.ArgumentParser(prog="noize_tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run a pipeline config")
    runp.add_argument("config")
    runp.add_argument("-o", "--outdir", default="out")

    demop = sub.add_parser("demo", help="run README example #1")
    demop.add_argument("-o", "--outdir", default="out")
    demop.add_argument("--resolution", type=int, default=512)

    erop = sub.add_parser("erode", help="generate then live-erode a tile")
    erop.add_argument("config", nargs="?")
    erop.add_argument("-o", "--outdir", default="out")
    erop.add_argument("--cycles", type=int, default=10)
    erop.add_argument("--resolution", type=int, default=256)
    erop.add_argument("--mesh", action="store_true",
                      help="also emit the eroded tile mesh as OBJ + NPZ")

    args = ap.parse_args(argv)

    if args.cmd == "run":
        with open(args.config) as fh:
            cfg = json.load(fh)
        _run(cfg, args.outdir, cfg.get("name", "pipeline"))
    elif args.cmd == "demo":
        cfg = dict(DEMO_CONFIG, resolution=args.resolution)
        _run(cfg, args.outdir, "demo")
    elif args.cmd == "erode":
        from ..erosion.params import ErosionSettings
        from ..erosion.sim import ErosionSim

        if args.config:
            with open(args.config) as fh:
                cfg = json.load(fh)
        else:
            cfg = dict(DEMO_CONFIG, resolution=args.resolution)
            cfg["stages"] = cfg["stages"][:2]  # noise + blur, keep heights
        arr = _run(cfg, args.outdir, "terrain")
        es_kwargs = cfg.get("erosion", {})
        if "BEHAVIOR" in es_kwargs:
            from ..erosion.params import ErosionMode

            es_kwargs = dict(es_kwargs,
                             BEHAVIOR=ErosionMode[es_kwargs["BEHAVIOR"]])
        sim = ErosionSim(arr, settings=ErosionSettings(**es_kwargs))
        t0 = time.perf_counter()
        sim.step(args.cycles)
        np.asarray(sim.height_map)
        dt = (time.perf_counter() - t0) * 1e3
        print(f"erosion: {args.cycles} cycles in {dt:.1f}ms")
        for name, m in (
            ("eroded_height", sim.height_map),
            ("pool", sim.pool_map),
            ("stream", sim.stream_map),
        ):
            viz.to_png(os.path.join(args.outdir, f"{name}.png"), np.asarray(m))
        print(f"wrote eroded_height/pool/stream PNGs -> {args.outdir}")
        if args.mesh:
            from ..ops.mesh import heightmap_mesh_overshoot
            from . import mesh_export as ME

            res = int(sim.height_map.shape[0])
            marr = heightmap_mesh_overshoot(
                sim.height_map, sim.meta.tile_res, res,
                float(sim.meta.height), float(sim.meta.tile_size))
            ME.to_obj(os.path.join(args.outdir, "tile.obj"), marr)
            ME.to_npz(os.path.join(args.outdir, "tile.npz"), marr)
            print(f"wrote tile.obj / tile.npz -> {args.outdir}")


if __name__ == "__main__":
    main()
