"""Method registry: the 6 GStex method configs + base.

Mirrors ``configs/gstex_configs.py`` (reference) — same model/optimizer/
trainer knobs per method:

| method            | dataparser | pixel_num | bg    | fix_init | iters | xyz lr |
|-------------------|------------|-----------|-------|----------|-------|--------|
| gstex-blender-init| blender    | 1e6       | white | no       | 1     | 5·1.6e-5 |
| gstex-colmap-init | nerfstudio | 1e7       | black | yes      | 1     | 2·1.6e-5 |
| gstex-blender-nvs | blender    | 1e6       | white | no       | 15000 | 5·1.6e-5 |
| gstex-dtu-nvs     | nerfstudio | 1e6       | black | yes      | 15000 | 2·1.6e-5 |
| gstex-blender-lod | blender    | 1e6       | white | no       | 7000  | 5·1.6e-4 |
| gstex-dtu-lod     | nerfstudio | 1e6       | black | yes      | 7000  | 2·1.6e-4 |
"""

from __future__ import annotations

import dataclasses

from ..models.gstex import GStexConfig
from ..train.optim import OptimConfig
from ..train.trainer import TrainerConfig


@dataclasses.dataclass
class MethodConfig:
    name: str
    dataparser: str                    # blender | nerfstudio
    model: GStexConfig
    optim: OptimConfig
    trainer: TrainerConfig
    downscale_factor: int = 1
    eval_mode: str = "fraction"        # nerfstudio parser eval split
    eval_interval: int = 8


def _blender(name, iters, pixel_num=1e6, xyz_mult=1.0, chart_pad=None):
    return MethodConfig(
        name=name,
        dataparser="blender",
        model=GStexConfig(pixel_num=pixel_num, background_color="white",
                          fix_init=False, chart_pad=chart_pad),
        optim=OptimConfig(spatial_scale=5.0, xyz_lr_mult=xyz_mult,
                          max_steps=iters),
        trainer=TrainerConfig(max_num_iterations=iters),
    )


def _dtu(name, iters, pixel_num=1e6, xyz_mult=1.0, chart_pad=None):
    return MethodConfig(
        name=name,
        dataparser="nerfstudio",
        model=GStexConfig(pixel_num=pixel_num, background_color="black",
                          fix_init=True, chart_pad=chart_pad),
        optim=OptimConfig(spatial_scale=2.0, xyz_lr_mult=xyz_mult,
                          max_steps=iters),
        trainer=TrainerConfig(max_num_iterations=iters),
        downscale_factor=2,
        eval_mode="interval",
        eval_interval=8,
    )


def auto_renderer() -> str:
    """Default renderer tier for the current backend: the fused Pallas
    kernels on TPU (the CUDA-rasterizer analog — the reference always runs
    its native kernels on GPU), the XLA tier elsewhere (CPU oracle)."""
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


def get_method(name: str) -> MethodConfig:
    methods = {
        "gstex": _blender("gstex", 15000),
        "gstex-blender-init": _blender("gstex-blender-init", 1),
        "gstex-blender-nvs": _blender("gstex-blender-nvs", 15000),
        "gstex-blender-lod": _blender("gstex-blender-lod", 7000,
                                      xyz_mult=10.0),
        # colmap-init uses a 1e7 texel budget; chart pad auto-resolves from
        # the scene's unclamped chart-dim distribution (resolve_chart_pad —
        # a pinned pad can silently clamp skewed scale distributions)
        "gstex-colmap-init": _dtu("gstex-colmap-init", 1, pixel_num=1e7),
        "gstex-dtu-nvs": _dtu("gstex-dtu-nvs", 15000),
        "gstex-dtu-lod": _dtu("gstex-dtu-lod", 7000, xyz_mult=10.0),
    }
    if name not in methods:
        raise KeyError(f"unknown method {name}; have {sorted(methods)}")
    return methods[name]
