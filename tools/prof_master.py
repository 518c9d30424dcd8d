"""Sub-part ablation of DigitMaster.fft_natural at mesh-of-1 (scratch).

Times, with the bench's scan+checksum+d2h discipline, per 3.24M-point block:
  casc1_t   stage-1 cascade WITH the two swapaxes transposes (as shipped)
  casc1_nt  stage-1 cascade over the LAST axis (no transposes) — the
            transpose cost is the difference
  casc2     stage-2 cascade (kept columns) alone
  turns     the three all_to_all corner turns + final transpose, cascades
            replaced by identity (pure data movement)
  tw        the twiddle multiply alone
  full      fft_natural as shipped
"""
import json, time, sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

sys.path.insert(0, "/root/repo")
from ka9q_radio_tpu.parallel import make_mesh
from ka9q_radio_tpu.parallel.master import DigitMaster
from ka9q_radio_tpu.ops.filterbank import split_fft_mxu

mesh = make_mesh()
N = 3_240_000
dm = DigitMaster.plan(mesh, "c", N, real=True)
n1, n2 = dm.n1, dm.n2
ax = dm.axis
cols = n2 // dm.D
kp = dm.kept_pad
print(f"# n1={n1} n2={n2} D={dm.D} mxu1={dm.mxu1} mxu2={dm.mxu2} kp={kp}", flush=True)

K, R = 8, 32

@jax.jit
def _mk():
    return jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 1e-3

def timer(fn):
    jfn = jax.jit(fn)
    def run(blocks):
        def body(acc, blk):
            return acc + jfn(blk), None
        def rep(_, acc):
            acc, _ = jax.lax.scan(body, acc, blocks)
            return acc
        return jax.lax.fori_loop(0, R, rep, jnp.float32(0))
    jrun = jax.jit(run)
    blocks = _mk()
    def span():
        t0 = time.perf_counter()
        acc = jrun(blocks)
        float(acc)
        return time.perf_counter() - t0
    span(); span()
    return min(span() for _ in range(3)) / (R * K)

def sharded(x):
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(ax)))

def mk_body(stage1=True, stage2=True, tw=True, transposes=True):
    def body(xs, twl):
        At = jax.lax.all_to_all(xs, ax, split_axis=1, concat_axis=0, tiled=True)
        if stage1:
            if transposes:
                A1 = jnp.swapaxes(split_fft_mxu(jnp.swapaxes(At, -1, -2), dm.mxu1,
                                                precision="high"), -1, -2)
            else:
                A1 = split_fft_mxu(At[:, :n1], dm.mxu1, precision="high")[..., :cols]
        else:
            A1 = At.astype(jnp.complex64)
        if tw:
            A1 = A1 * twl
        Bt = jax.lax.all_to_all(A1, ax, split_axis=0, concat_axis=1, tiled=True)
        if stage2:
            C = split_fft_mxu(Bt, dm.mxu2, kp if kp < n2 else None,
                              precision="high")[..., :kp]
        else:
            C = Bt[..., :kp]
        Ct = jax.lax.all_to_all(C, ax, split_axis=1, concat_axis=0, tiled=True)
        return Ct.T.reshape(-1)
    fn = shard_map(body, mesh=mesh, in_specs=(P(ax, None), P(None, ax)),
                   out_specs=P(ax), check_vma=False)
    def f(blk):
        # twiddle transfer happens at trace time INSIDE jit (eager device
        # ops poison the axon tunnel)
        F = fn(sharded(blk).reshape(n1, n2), dm._tw_sharded())
        return jnp.sum(jnp.abs(F[:64]))
    return f

cases = {
    "full": mk_body(),
    "turns": mk_body(stage1=False, stage2=False, tw=False),
    "no_tw": mk_body(tw=False),
    "casc1_only": mk_body(stage2=False, tw=False),
    "casc1_nt": mk_body(stage2=False, tw=False, transposes=False),
    "casc2_only": mk_body(stage1=False, tw=False),
}
for name, f in cases.items():
    for attempt in range(5):
        try:
            dt = timer(f)
            print(json.dumps({"case": name, "ms": round(dt * 1e3, 4)}), flush=True)
            break
        except Exception as e:
            print(f"# {name} attempt {attempt}: {type(e).__name__}: {e}", flush=True)
            time.sleep(15.0)
