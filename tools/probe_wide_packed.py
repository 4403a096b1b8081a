"""Probe: WHY does plan_pair_contract reject the wide-spread FEM class?

Replicates the round-4 judge probe (n=65,536, ~12/row + diag, level 2)
at bandwidth +-48 / +-600 and prints, per stage: closure size, pair
count, and the distribution stats that drive the planner's budgets —
per-tile vreg counts (group fragmentation), per-tile ublock/lblock
window spans vs _WIN_ROWS_CAP, and the spill fraction a median-anchored
window would leave.
"""
import sys, time
sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.factorization.par_ilut_packed import _closure
from ginkgo_tpu.native import ilut_pairs_rowmajor_native
from ginkgo_tpu.ops.pair_contract import _OW, _NV_CAP, _WIN_ROWS_CAP


def pattern(n, spread, n_off=20, seed=5):
    rng = np.random.default_rng(seed)
    block = 128
    offs = rng.integers(-spread, spread, (n // block, n_off))
    pick = rng.random((n, n_off)) < 0.6
    r = np.repeat(np.arange(n), n_off).reshape(n, n_off)
    c = np.clip(r + offs[np.arange(n) // block], 0, n - 1)
    rows, cols = r[pick], c[pick]
    rows = np.concatenate([rows, np.arange(n)])
    cols = np.concatenate([cols, np.arange(n)])
    key = np.unique(rows * n + cols)
    rows, cols = (key // n).astype(np.int64), (key % n).astype(np.int64)
    vals = np.ones(rows.size)
    return MatrixData((n, n), rows, cols, vals)


def probe(n, spread, level=2):
    print(f"=== n={n} spread=+-{spread} level={level} ===")
    d = pattern(n, spread)
    print(f"A nnz={d.nnz} ({d.nnz/n:.1f}/row)")
    t0 = time.time()
    univ = _closure(d, level, 40_000_000)
    print(f"closure: {time.time()-t0:.1f}s slots={len(univ[0])}"
          f" ({len(univ[0])/n:.1f}/row)")
    rows, cols = univ
    low = rows > cols
    lr, lc = rows[low], cols[low]
    ur, uc = rows[~low], cols[~low]
    nl, nu = len(lr), len(ur)
    t0 = time.time()
    pairs = ilut_pairs_rowmajor_native(n, lr, lc, ur, uc,
                                       cap=600_000_000)
    if pairs is None:
        print("pair emission: CAP EXCEEDED"); return
    pl_, pu_, po_ = [np.asarray(x, np.int64) for x in pairs]
    npairs = len(po_)
    print(f"pairs: {time.time()-t0:.1f}s npairs={npairs} "
          f"({npairs/ (nl+nu):.1f}/slot)")
    t0 = time.time()
    # planner-model stats
    tile = po_ >> 10
    ub = pu_ >> 10
    lb = pl_ >> 10
    T = -(-(nl + nu) // _OW)
    # group fragmentation: # of (tile, ub, lb) groups and vregs
    key = (tile.astype(np.int64) << 40) | (ub.astype(np.int64) << 20) | lb
    skey = np.sort(key)
    gchange = np.ones(npairs, bool)
    gchange[1:] = skey[1:] != skey[:-1]
    gsizes = np.diff(np.append(np.flatnonzero(gchange), npairs))
    ngroups = len(gsizes)
    nvregs = int(np.sum(-(-gsizes // 1024)))
    print(f"groups={ngroups} vregs={nvregs} avg_grp={npairs/ngroups:.0f}"
          f" vregs/tile avg={nvregs/T:.1f} (NV_CAP={_NV_CAP})")
    # per-tile vreg counts
    gtile = (skey[gchange.nonzero()[0]] >> 40)
    vreg_per_g = -(-gsizes // 1024)
    vt = np.bincount(gtile.astype(np.int64), weights=vreg_per_g,
                     minlength=T)
    print(f"vregs/tile p50={np.percentile(vt,50):.0f} "
          f"p90={np.percentile(vt,90):.0f} p99={np.percentile(vt,99):.0f}"
          f" max={vt.max():.0f}")
    # window span per tile (in 1024-blocks); capb blocks fit
    capb = _WIN_ROWS_CAP // 8
    for name, blocks in (("lb", lb), ("ub", ub)):
        order = np.lexsort((blocks, tile))
        st, sb = tile[order], blocks[order]
        tch = np.ones(npairs, bool)
        tch[1:] = st[1:] != st[:-1]
        starts = np.flatnonzero(tch)
        ends = np.append(starts[1:], npairs)
        lo = sb[starts]
        hi = sb[ends - 1]
        span = hi - lo + 1
        med = sb[(starts + ends) // 2]
        # spill = pairs outside [med - capb//2, med + capb//2)
        tmed = np.zeros(T, np.int64)
        tmed[st[starts]] = med
        out = np.abs(sb - tmed[st]) > capb // 2
        print(f"  {name}: span blocks p50={np.percentile(span,50):.0f} "
              f"p90={np.percentile(span,90):.0f} max={span.max()} "
              f"(capb={capb}); median-window spill="
              f"{out.sum()/npairs*100:.2f}%")
    print(f"stats: {time.time()-t0:.1f}s")
    # the actual planner verdict + timing
    from ginkgo_tpu.ops.pair_contract import plan_pair_contract
    t0 = time.time()
    plan = plan_pair_contract(pl_, pu_, po_, nl + nu, nl, nu)
    dt = time.time() - t0
    if plan is None:
        print(f"plan_pair_contract: REJECT after {dt:.1f}s")
    else:
        print(f"plan_pair_contract: ACCEPT {dt:.1f}s T={plan['meta']}")
    print()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    spreads = ([int(s) for s in sys.argv[2].split(",")]
               if len(sys.argv) > 2 else [48, 600])
    for spread in spreads:
        probe(n, spread)
