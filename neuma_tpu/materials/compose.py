"""Static section routing of per-object materials.

TPU-native version of the reference's ``ComposeMaterial``
(``modules/nclaw/material/preset.py:12-27``): particle sections are known
at trace time, so routing compiles to static slices + concat — the
"static contiguous-section MoE" noted in SURVEY.md section 2.3.
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp


class ComposeMaterial:
    def __init__(self, materials: Sequence, sections: Sequence[int]):
        self.materials = list(materials)
        self.sections = list(sections)

    def update_sections(self, sections: Sequence[int]) -> None:
        self.sections = list(sections)

    def init(self, keys) -> List:
        return [m.init(k) for m, k in zip(self.materials, keys)]

    def apply(self, params_list: List, F: jnp.ndarray) -> jnp.ndarray:
        outs = []
        offset = 0
        for mat, params, n in zip(self.materials, params_list, self.sections):
            if n == 0:
                continue
            outs.append(mat.apply(params, F[offset : offset + n]))
            offset += n
        return jnp.concatenate(outs, axis=0)
