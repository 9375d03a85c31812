from chromosome3d_tpu.ops.energy import (
    DenseRestraints,
    EnergyWeights,
    energy,
    energy_terms,
    dense_restraints_from_numpy,
)

__all__ = [
    "DenseRestraints",
    "EnergyWeights",
    "energy",
    "energy_terms",
    "dense_restraints_from_numpy",
]
