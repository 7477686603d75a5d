"""Demo pipeline presets — the BasicDemo~ scene's stage assets/pipelines.

Extracted from /root/reference/BasicDemo~/: the serialized stage assets
(Perl.asset, Simplex.asset, Sin.asset, GaussLF/HF.asset, Sobel2D.asset,
FlowMapStage.asset) and the four pipeline compositions wired in
DynamicNoise.unity:155-161,401-406,450-455 (SURVEY.md §3.2).

The two AnimationCurve assets (Invert, CurveBoostContrast) carry Bezier
keyframes we approximate analytically: Invert ≈ 1 − t, CurveBoostContrast ≈
a smoothstep contrast boost — noted as approximations.
"""

from __future__ import annotations

from ..pipeline import stages as S
from ..pipeline.compose import PipelineDefinition

# --- stage assets -----------------------------------------------------------

PERL = S.NoiseStage(noiseType="Perlin", hurst=0.5938, startingAmplitude=1.0,
                    octaves=6, stepdown=1.9168, detuneRate=0.0317,
                    noiseSize=658)
SIMPLEX = S.NoiseStage(noiseType="Simplex", hurst=0.9001, octaves=6,
                       stepdown=2.0, detuneRate=0.0, noiseSize=7475)
SIN = S.NoiseStage(noiseType="Sin", hurst=0.87, octaves=5, stepdown=1.9607,
                   detuneRate=0.04, noiseSize=187)
GAUSS_LF = S.KernelFilterStage(filter="Gauss9_S1", iterations=2)
GAUSS_HF = S.KernelFilterStage(filter="Gauss3_S1", iterations=3)
SOBEL_2D = S.KernelFilterStage(filter="Sobel3_2D", iterations=1)
FLOW_MAP = S.FlowMapStage(iterations=1, normMin=0.0, normMax=0.005)
INVERT = S.CurveStage.from_function(lambda t: 1.0 - t)                 # approx
CURVE_BOOST_CONTRAST = S.CurveStage.from_function(
    lambda t: t * t * (3.0 - 2.0 * t)                                  # approx
)

# --- pipeline compositions (DynamicNoise.unity) ------------------------------

PERLIN_GENERATOR = PipelineDefinition(
    "PerlinGenerator", (SIMPLEX, GAUSS_LF, INVERT, GAUSS_HF)
)
FLOW_MAP_PIPELINE = PipelineDefinition(
    "FlowMap", (PERL, INVERT, FLOW_MAP, CURVE_BOOST_CONTRAST)
)
SOBEL_PIPELINE = PipelineDefinition(
    "Sobel", (GAUSS_HF, GAUSS_LF, SOBEL_2D, CURVE_BOOST_CONTRAST)
)
MESH_PIPELINE = PipelineDefinition("Mesh", (S.MeshTileStage(overshoot=False),))

ALL = {
    p.name: p for p in (
        PERLIN_GENERATOR, FLOW_MAP_PIPELINE, SOBEL_PIPELINE, MESH_PIPELINE,
    )
}
