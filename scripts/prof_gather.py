"""Measure TPU gather/slice strategies for the structured-lattice fast path.

Question: can the (ne, nl) element gather (811k scalar loads, ~6.6 ms at
192^2) and the (n_dof, k) transpose-gather combine (~10 ms) be replaced by
a field-grid permutation (n_dof scalars) + stride-2 slices + parity pad/add
combines — and what does each primitive actually cost on this chip?
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def scan_time(body, x0, loops=16, reps=3):
    @jax.jit
    def run(x):
        def step(c, _):
            out = body(c)
            leaves = jax.tree.leaves(out)
            probe = sum(jnp.sum(l[..., :1].astype(jnp.float32))
                        for l in leaves)
            return c + jnp.float32(1e-30) * probe, probe
        c, outs = jax.lax.scan(step, x, None, length=loops)
        return c, outs

    jax.device_get(run(x0)[0].ravel()[:1])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        c, _ = run(x0)
        jax.device_get(c.ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / loops)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    jax.config.update("jax_enable_x64", True)
    from __graft_entry__ import _cavity_problem
    from goma_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    prob = _cavity_problem(n)
    ne = prob.mesh.n_elem
    nd = prob.dofmap.n_dof
    f32 = jnp.float32
    x = jnp.zeros(nd, dtype=f32)
    g = jax.device_put(prob.dofmap.blocks[0].gather.astype(np.int32))

    dm = prob.dofmap
    # field-grid permutations from dof_of_node_svar on the lattice node grid
    nn = 2 * n + 1
    nodes = np.arange(dm.mesh.n_nodes).reshape(nn, nn)
    perm_u = dm.dof_of_node_svar[nodes, 0]           # (nn, nn)
    perm_v = dm.dof_of_node_svar[nodes, 1]
    pc = dm.dof_of_node_svar[nodes[::2, ::2], 2]     # (n+1, n+1) corners
    assert perm_u.min() >= 0 and pc.min() >= 0
    perm_all = np.concatenate([perm_u.ravel(), perm_v.ravel(), pc.ravel()])
    inv = np.empty(nd, dtype=np.int64)
    inv[perm_all] = np.arange(nd)
    P = jax.device_put(perm_all.astype(np.int32))
    IV = jax.device_put(inv.astype(np.int32))
    print(f"ne={ne} nd={nd} perm={perm_all.size}")

    def pe(t):
        return f"{t*1e3:8.3f} ms  {t/ne*1e6:7.4f} us/elem"

    print("x[g] (ne,22)            ", pe(scan_time(lambda c: c[g], x)))
    print("x[perm] (nd)            ", pe(scan_time(lambda c: c[P], x)))
    print("x[inv] (nd)             ", pe(scan_time(lambda c: c[IV], x)))

    # stride-2 slices: grid (nn, nn) -> 9 element slabs (n, n)
    nu = nn * nn

    def slices(c):
        ug = c[:nu].reshape(nn, nn)
        slabs = [ug[dj:dj + 2 * n - 1:2, di:di + 2 * n - 1:2]
                 for dj in range(3) for di in range(3)]
        return jnp.stack(slabs)

    print("9 stride-2 slices       ", pe(scan_time(slices, x)))

    # parity pad+add combine: 9 slabs (n, n) -> (nn, nn) accumulation
    slabs0 = jnp.ones((9, n, n), dtype=f32)

    def combine(s):
        # parity subgrids: even-even (n+1, n+1), even-odd (n+1, n), ...
        z = []
        for pj in range(2):
            for pi in range(2):
                hj = n + 1 if pj == 0 else n
                hi = n + 1 if pi == 0 else n
                acc = jnp.zeros((hj, hi), dtype=f32)
                k = 0
                for dj in range(3):
                    for di in range(3):
                        if dj % 2 == pj and di % 2 == pi:
                            # slab (n, n) lands at node (2J+dj, 2I+di):
                            # parity row index J + dj//2
                            oj, oi = dj // 2, di // 2
                            acc = acc.at[oj:oj + n, oi:oi + n].add(s[k])
                        k += 1
                z.append(acc.reshape(-1))
        return jnp.concatenate(z)

    print("parity pad+add combine  ", pe(scan_time(combine, slabs0)))

    # transpose-gather combine baseline (one pass over tg)
    T = prob._tables
    tg = T["tg"]
    flat = jnp.ones(ne * 22 + 1, dtype=f32)

    def tgather(c):
        return jnp.sum((flat * c[0]) [tg], axis=1)

    print("tg combine baseline     ", pe(scan_time(tgather, x)))

    # 2D shared-column gather: x2[:, idx] with period-W reshape
    W = nd // n  # approximate row period (diagnostic only)
    print(f"(diag) dofs/elem-row W ~ {nd/n:.1f}")


if __name__ == "__main__":
    main()
