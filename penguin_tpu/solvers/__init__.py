from .diffusion import (
    DiffusionSteadyMono,
    DiffusionUnsteadyMono,
    DiffusionSteadyDiph,
    DiffusionUnsteadyDiph,
)

__all__ = [
    "DiffusionSteadyMono",
    "DiffusionUnsteadyMono",
    "DiffusionSteadyDiph",
    "DiffusionUnsteadyDiph",
]
