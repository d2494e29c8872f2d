"""Staged chip probe for the two-phase (raw) Pallas encode kernel.

Writes progress to /tmp/chipjobs/raw_probe.progress after EVERY stage —
the chipserver only flushes stdout at job end, so a hang would
otherwise be unlocalizable (the r3 first attempt hung >35 min with no
trace; see docs/PERF_NOTES.md round-3 notes).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from vcf_tpu.entropy import rans
from vcf_tpu.ops.pallas import rans_encode as re_

PROG = "/tmp/chipjobs/raw_probe.progress"


def log(msg):
    with open(PROG, "a") as f:
        f.write(f"{time.time():.0f} {msg}\n")
    print(msg)


rng = np.random.default_rng(0)
G, SG = 64, 1024
S = G * SG

# ---- stage 1: tiny L, kernel-only ------------------------------------
L1 = 8
syms1 = (rng.integers(0, 200, size=(S, L1)) % 17).astype(np.uint8)
f1 = rans.quantize_freqs(np.bincount(syms1.reshape(-1), minlength=256),
                         min_all=True)
fg1 = np.tile(f1, (G, 1))
cg1 = np.tile(np.concatenate(([0], np.cumsum(f1)))[:256].astype(np.uint32),
              (G, 1))
fj1, cj1 = jnp.asarray(fg1.astype(np.uint32)), jnp.asarray(cg1)
log("stage1: compiling small raw kernel")
t0 = time.time()
le1, st1 = re_.pallas_encode_grouped_raw(jnp.asarray(syms1), fj1, cj1,
                                         unroll=4)
le1h = np.asarray(le1)
log(f"stage1 ok in {time.time()-t0:.1f}s")
w1, n1, c1 = re_.finish_stream(le1)
wx1, nx1, sx1, cx1 = rans.jax_encode_grouped(
    jnp.asarray(syms1), fj1, cj1, unroll=4, with_counts=True)
ok1 = (int(n1) == int(nx1)
       and np.array_equal(np.asarray(w1[:int(n1)]), np.asarray(wx1[:int(nx1)]))
       and np.array_equal(np.asarray(st1), np.asarray(sx1)))
log(f"stage1 bit-exact: {ok1}")

# ---- stage 2: bench shape single run ---------------------------------
L = 768
syms = rng.integers(0, 200, size=(S, L)).astype(np.uint8)
for g in range(G):
    syms[g*SG:(g+1)*SG] = (syms[g*SG:(g+1)*SG] % (4 + 2*g)).astype(np.uint8)
freqs_g = np.stack([
    rans.quantize_freqs(np.bincount(syms[g*SG:(g+1)*SG].reshape(-1),
                        minlength=256), min_all=True) for g in range(G)])
cums_g = np.stack([
    np.concatenate(([0], np.cumsum(f)))[:256].astype(np.uint32)
    for f in freqs_g])
fj = jnp.asarray(freqs_g.astype(np.uint32))
cj = jnp.asarray(cums_g)
sd = jnp.asarray(syms)
log("stage2: compiling bench-shape raw kernel")
t0 = time.time()
le, st = re_.pallas_encode_grouped_raw(sd, fj, cj, unroll=4)
le0 = int(np.asarray(le[0, 0]))
log(f"stage2 kernel ok in {time.time()-t0:.1f}s")
wp, nwp, cts = re_.finish_stream(le)
nwp = int(nwp)
log(f"stage2 finish ok nw={nwp}")
wx, nwx, stx, ctx = rans.jax_encode_grouped(sd, fj, cj, unroll=4,
                                            with_counts=True)
nwx = int(nwx)
ok = (nwp == nwx
      and np.array_equal(np.asarray(wp[:nwx]), np.asarray(wx[:nwx]))
      and np.array_equal(np.asarray(st), np.asarray(stx))
      and np.array_equal(np.asarray(cts), np.asarray(ctx)))
log(f"stage2 bit-exact: {ok}")

# ---- stage 3: kernel-only timing -------------------------------------
@jax.jit
def timed_k(reps):
    def body(i, acc):
        le_, st_ = re_.pallas_encode_grouped_raw(
            jnp.roll(sd, i, axis=0), fj, cj, unroll=4)
        return acc + le_[0, 0] + st_[0].astype(jnp.int32)
    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

log("stage3: compiling kernel-only rep loop")
int(timed_k(jnp.int32(1)))
log("stage3 first run done")
int(timed_k(jnp.int32(1)))
t0 = time.time(); int(timed_k(jnp.int32(2))); t2 = time.time() - t0
t0 = time.time(); int(timed_k(jnp.int32(10))); t10 = time.time() - t0
log(f"stage3 raw kernel per-rep: {(t10-t2)/8*1000:.1f} ms")

# ---- stage 4: kernel + finish timing ---------------------------------
@jax.jit
def timed_r(reps):
    def body(i, acc):
        le_, st_ = re_.pallas_encode_grouped_raw(
            jnp.roll(sd, i, axis=0), fj, cj, unroll=4)
        w, nw, c = re_.finish_stream(le_)
        return acc + nw + w[0].astype(jnp.int32)
    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

log("stage4: compiling kernel+finish rep loop")
int(timed_r(jnp.int32(1)))
log("stage4 first run done")
int(timed_r(jnp.int32(1)))
t0 = time.time(); int(timed_r(jnp.int32(2))); t2 = time.time() - t0
t0 = time.time(); int(timed_r(jnp.int32(10))); t10 = time.time() - t0
per = (t10 - t2) / 8
log(f"stage4 raw encode+finish per-rep: {per*1000:.1f} ms "
    f"({S*L/per/1e9:.2f} GB/s)")
