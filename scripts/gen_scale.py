"""Gen-mode construction at reference-sweep scale (N=80000) on the
8-device virtual CPU mesh: 2x beyond the single-chip HBM limit. The
matvec/solve correctness of the same operator is mesh-tested at smaller
N (tests/test_sharded.py::test_symm_sharded_gen_tridiagonal_device_side);
here the SLAB LAYOUT of the constructed planes is verified entry-wise
against the closed-form tridiagonal + band-pair permutation."""
import os, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import numpy as np
import lam_tpu
lam_tpu.force_platform("cpu")
import jax
from lam_tpu.parallel.mesh import make_mesh
from lam_tpu.parallel.pcg_symm import SymmShardedOperator, _slab_row_ranges

n = 80000
mesh = make_mesh(8)
t0 = time.time()
op = SymmShardedOperator.from_gen_tridiagonal(n, mesh=mesh)
jax.block_until_ready(op.operand)
t_build = time.time() - t0
hi, lo = op.operand[0], op.operand[1]
g, m = op._g, op._m
print(f"N={n} symm-sharded gen build: {t_build:.1f} s, padded {op.n_padded}, "
      f"hi plane {hi.nbytes/2**30:.1f} GiB + lo {lo.nbytes/2**30:.1f} GiB "
      f"across {g} shards of {2*m} slab rows")

# verify shard 0 and shard g-1 slab contents against the closed form:
# slab row local L of chip c = original row r0+L of band b (via
# _slab_row_ranges); tridiagonal: A[r, r]=2, A[r, r+-1]=1
bad = 0
for shard in (hi.addressable_shards[0], hi.addressable_shards[-1]):
    c = shard.index[0].start // (2 * m)
    block = np.asarray(shard.data)      # (2m, n_padded) f32
    for (r0, mr), half in zip(_slab_row_ranges(c, g, m), (0, 1)):
        for local in (0, 1, m - 1):     # sample rows per band
            r = r0 + local
            row = block[half * m + local]
            expect = np.zeros(op.n_padded, np.float32)
            if r < n:
                expect[r] = 2.0
                if r > 0: expect[r - 1] = 1.0
                if r + 1 < n: expect[r + 1] = 1.0
            if not np.array_equal(row, expect):
                bad += 1
print(f"slab-layout entry check: {'FAIL ' + str(bad) if bad else 'exact'} "
      f"(12 sampled rows across first/last shards, both bands)")
assert bad == 0
assert float(jax.numpy.max(jax.numpy.abs(lo.addressable_shards[0].data))) == 0.0
print("GEN_SCALE OK")
