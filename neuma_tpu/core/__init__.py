from .types import (
    MPMConstants,
    ParticleState,
    Statics,
    GridState,
)

__all__ = [
    "MPMConstants",
    "ParticleState",
    "Statics",
    "GridState",
]
