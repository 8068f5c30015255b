"""Physics ops. Each sweep (density, color gradient, force) has:

  - a dense O(N^2) reference implementation (ops.dense) — the correctness
    oracle, used by tests and tiny configs;
  - a cell-grid implementation (ops.cellgrid) — XLA gather/segment-sum over a
    sorted cell grid, the default fast path;
  - a fused Pallas kernel (ops.pallas_pair) — the TPU speed-of-light path.

All three share the per-pair physics in ops.pair_terms, so there is exactly
one statement of each equation (reference: the pair_sph_* styles of
src/USER-SPH/, SURVEY.md §2.2–2.3).
"""

from tpusph.ops import pair_terms, dense  # noqa: F401
