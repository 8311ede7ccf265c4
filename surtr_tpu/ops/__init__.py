"""Geometry kernels (pure, renderer-free) — the TPU-era analogue of the
reference's L4 layer (VMACH / Poly / Kdop / DT3D, SURVEY.md §1)."""
