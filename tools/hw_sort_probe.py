"""Hardware probe: argsort + stacked row gather vs multi-operand lax.sort.

``sort_boxes`` costs ~210 ms of the grid-1000 frame: ~35 ms f32-key
argsort + ~175 ms applying the permutation as one stacked (n, 10) i32
row gather (~10 ns/ROW — latency-bound, 500x off bandwidth).  A single
multi-operand ``lax.sort`` moves the payload columns INSIDE the sort:
the round-3 measurement said a second operand cost only +6 ms at 3M
rows, so eleven operands may land well under argsort+gather.  Same
question for ``pack_boxes_ap``'s extent-class stable partition
(1-bit key + 11 payload columns).

Prints both formulations at 2^21 and 3.1M rows.  The sort is on the
f32 key bitcast-widened monotonically to i32 (the same trick the
box-sort uses for NaN-free total order is NOT needed here: keys are
finite reals, so sort f32 directly), payloads all i32.

ONE TPU job at a time (CLAUDE.md); nohup, never ``timeout``.

Usage: python tools/hw_sort_probe.py
"""
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

import scalable_ccd_tpu  # noqa: F401  (compile cache)


def _time(fn, reps=5):
    r = fn()
    jax.device_get(r[0].ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        jax.device_get(r[0].ravel()[0])
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for n in (1 << 21, 3_100_000):
        key = jnp.asarray(rng.random(n, np.float32))
        pay = jnp.asarray(rng.integers(0, 1 << 30, (n, 10), np.int32))

        @jax.jit
        def argsort_gather(key=key, pay=pay):
            order = jnp.argsort(key)
            stacked = jnp.concatenate(
                [jax.lax.bitcast_convert_type(key, jnp.int32)[:, None],
                 pay], axis=1,
            )[order]
            return (stacked,)

        @jax.jit
        def multi_sort(key=key, pay=pay):
            ops = jax.lax.sort(
                (key, *(pay[:, i] for i in range(10))), num_keys=1,
            )
            return (ops[0], ops[1])

        t_ag = _time(argsort_gather)
        t_ms = _time(multi_sort)
        print(f"n={n}: argsort+gather {t_ag:7.1f} ms   "
              f"11-operand lax.sort {t_ms:7.1f} ms", flush=True)

        # the extent-class stable partition (pack_boxes_ap): 1-bit key
        bitkey = (key > 0.9).astype(jnp.int32)

        @jax.jit
        def part_gather(bitkey=bitkey, pay=pay):
            order = jnp.argsort(bitkey, stable=True)
            return (pay[order],)

        @jax.jit
        def part_sort(bitkey=bitkey, pay=pay):
            ops = jax.lax.sort(
                (bitkey, *(pay[:, i] for i in range(10))),
                num_keys=1, is_stable=True,
            )
            return (ops[1],)

        t_pg = _time(part_gather)
        t_ps = _time(part_sort)
        print(f"n={n}: partition argsort+gather {t_pg:7.1f} ms   "
              f"stable 11-operand sort {t_ps:7.1f} ms", flush=True)

    # the real thing: sort_boxes end-to-end, both reorder impls
    from scalable_ccd_tpu.broad_phase.sweep import sort_boxes
    from scalable_ccd_tpu.geometry.aabb import AABBs

    n = 3_100_000
    mn = jnp.asarray(rng.uniform(0, 100, (n, 3)).astype(np.float32))
    mx = mn + jnp.asarray(rng.uniform(0.01, 0.5, (n, 3)).astype(np.float32))
    boxes = AABBs(
        min=mn, max=mx,
        vertex_ids=jnp.asarray(
            rng.integers(0, 1 << 20, (n, 3), np.int32)),
        element_id=jnp.asarray(np.arange(n, dtype=np.int32)),
    )
    for bm in (False, True):
        for impl in ("gather", "sort"):
            def run(_bm=bm, _impl=impl):
                sb = sort_boxes(boxes, bucket_minor=_bm, reorder=_impl)
                return (sb.major_min,)

            t = _time(run)
            print(f"sort_boxes bucket_minor={bm} reorder={impl}: "
                  f"{t:7.1f} ms", flush=True)
    print("sort probe complete", flush=True)


if __name__ == "__main__":
    main()
