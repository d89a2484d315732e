"""Batched FEM compute: quadrature/shape tables, element operators, and
matrix-free operator applies (gather -> batched MXU matvec -> segment_sum)."""
