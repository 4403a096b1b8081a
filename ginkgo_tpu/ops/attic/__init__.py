"""Attic: superseded kernel generations, kept with their measurements.

Two earlier answers to the general-unstructured SpMV problem, both
fully working and interpret-tested, both superseded by the packed-slot
windowed-ELL kernel (``ops/spmv_packed.py``) that ships as the ``packed``
CSR strategy:

- ``spmv_windowed``: H-way gather/select per vreg.  Measured (round 2,
  v5e, FEM pattern): ~320 GB/s effective — the per-vreg select chain
  keeps the VPU busy on control, not data.
- ``spmv_chunked``: one x-chunk per vreg with 8-slot rounding per
  (block, chunk) group.  Measured: the rounding costs 6-7x padding on
  scattered matrices, capping effective bandwidth at ~120 GB/s there
  (banded-like patterns were fine, but those take the DIA path anyway).

The packed kernel subsumes both (sorted slots, aligned 8-chunk windows,
~1.1-1.5x padding, 689-846 GB/s measured).  These modules are NOT
imported by the package; their kernels enter the registry only if you
import them explicitly (tests/experiments).
"""
