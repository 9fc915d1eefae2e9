"""TPU microbenchmarks for dense-front factorization alternatives."""

import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def bench(f, *a, reps=10):
    import jax
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(f(*a))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    import jax
    import jax.numpy as jnp
    from jax.lax.linalg import lu, triangular_solve, qr

    log(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    shapes = [(188, 361), (128, 470), (16, 867), (1, 561)]
    for nn, s in shapes:
        A = jax.random.normal(key, (nn, s, s), jnp.float32) + \
            10.0 * jnp.eye(s, dtype=jnp.float32)[None]
        B = jax.random.normal(key, (nn, s, 128), jnp.float32)
        f_lu = jax.jit(lambda A: lu(A)[0])
        t_lu = bench(f_lu, A)
        f_qr = jax.jit(lambda A: qr(A, full_matrices=False)[0])
        t_qr = bench(f_qr, A)
        f_ts = jax.jit(lambda A, B: triangular_solve(
            A, B, left_side=True, lower=True, unit_diagonal=True))
        t_ts = bench(f_ts, A, B)
        f_mm = jax.jit(lambda A, B: A @ B)
        t_mm = bench(f_mm, A, B)
        f_inv = jax.jit(lambda A: jnp.linalg.inv(A))
        t_inv = bench(f_inv, A)

        # 2-level blocked no-pivot LU prototype: half-size lu + solves + schur
        def blocked(A):
            h = A.shape[-1] // 2
            A11, A12 = A[:, :h, :h], A[:, :h, h:]
            A21, A22 = A[:, h:, :h], A[:, h:, h:]
            lu1 = lu(A11)[0]
            Y = triangular_solve(lu1, A12, left_side=True, lower=True,
                                 unit_diagonal=True)
            X = triangular_solve(lu1, A21, left_side=False, lower=False)
            S = A22 - X @ Y
            lu2 = lu(S)[0]
            return lu1, lu2, X, Y
        t_bl = bench(jax.jit(blocked), A)
        log(f"({nn},{s}): lu {t_lu:.1f} qr {t_qr:.1f} tri {t_ts:.1f} "
            f"mm {t_mm:.2f} inv {t_inv:.1f} blocked2 {t_bl:.1f} ms")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
