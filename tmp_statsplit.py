import sys, time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from orbitanalysis_tpu.ops.pallas_merge import _LANES
from orbitanalysis_tpu.ops.pallas_compact import _compact_group
from orbitanalysis_tpu.ops.pallas_step import _acos_f32

mode = sys.argv[1]  # 'detect' | 'full'
H, P = 1020, 65536
r = P // _LANES
REPS = 6
kk = jax.random.PRNGKey(1); ks = jax.random.split(kk, 12)
ck = ((jnp.broadcast_to(jnp.arange(P,dtype=jnp.int32),(H,P)) + jax.random.randint(ks[0],(H,1),0,7))<<1|1).astype(jnp.uint32)
psv = jax.random.randint(ks[1],(H,P),0,1<<27,jnp.int32)
pay = [jax.random.normal(ks[i],(H,P),jnp.float32) for i in range(2,10)]

def kern(n, *refs):
    (pk, psvr, prx, pry, prz, pang, ckr, csv, crx, cry, crz,
     out_packed, out_evk, out_evsv, out_evang, out_count) = refs
    ids = ckr[0] >> 1
    valid = ids != jnp.uint32(0x7fffffff)
    vrb_p = (psvr[0] >> 24).astype(jnp.int32)
    vrb_c = (csv[0] >> 24).astype(jnp.int32)
    cosang = jnp.clip(prx[0]*crx[0] + pry[0]*cry[0] + prz[0]*crz[0], -1.0, 1.0)
    dtheta = jnp.where(valid, _acos_f32(cosang), 0.0)
    flip = ((vrb_p & 1) > 0) & ((vrb_c & 2) > 0)
    apsis = valid & flip
    angle_acc = pang[0] + dtheta
    apsis_angle = jnp.where(apsis, angle_acc, 0.0)
    angle_new = jnp.where(apsis | ~valid, 0.0, angle_acc)
    out_packed[0] = pltpu.bitcast(angle_new, jnp.uint32) | (valid.astype(jnp.uint32) << 31)
    apsis_i = apsis.astype(jnp.int32)
    out_count[0] = jnp.full((8, _LANES), jnp.sum(apsis_i), jnp.int32)
    if mode == 'full':
        evk, evsv, evang = _compact_group(apsis_i, [ckr[0], psvr[0], apsis_angle], n)
    else:
        evk, evsv, evang = ckr[0], psvr[0], apsis_angle
    rows_k = out_evk.shape[1]
    out_evk[0] = evk[:rows_k]
    out_evsv[0] = evsv[:rows_k]
    out_evang[0] = evang[:rows_k]

spec = pl.BlockSpec((1,r,_LANES), lambda i:(i,0,0), memory_space=pltpu.VMEM)
out_shapes = (jax.ShapeDtypeStruct((H,r,_LANES),jnp.uint32),
              jax.ShapeDtypeStruct((H,r,_LANES),jnp.uint32),
              jax.ShapeDtypeStruct((H,r,_LANES),jnp.int32),
              jax.ShapeDtypeStruct((H,r,_LANES),jnp.float32),
              jax.ShapeDtypeStruct((H,8,_LANES),jnp.int32))
out_specs = (spec,spec,spec,spec,pl.BlockSpec((1,8,_LANES), lambda i:(i,0,0), memory_space=pltpu.VMEM))
def one(*arrays):
    arrays = tuple(a.reshape(H,r,_LANES) for a in arrays)
    return pl.pallas_call(functools.partial(kern, P), grid=(H,),
        out_shape=out_shapes, in_specs=[spec]*11, out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024))(*arrays)

@jax.jit
def call(*arrays):
    def body(c, _):
        a2 = (arrays[0] + (c<<1),) + arrays[1:]
        out = one(*a2)
        return c + 1, out[0][0,0,0]
    c, outs = jax.lax.scan(body, jnp.uint32(0), None, length=REPS)
    return jnp.sum(outs.astype(jnp.float32))

args = (ck.astype(jnp.uint32)*0 + (jnp.broadcast_to(jnp.arange(P,dtype=jnp.int32),(H,P))<<1).astype(jnp.uint32), psv,
        pay[0],pay[1],pay[2],pay[3], ck, psv, pay[4],pay[5],pay[6])
t0=time.time(); _=float(np.asarray(call(*args))); print(f"compile {time.time()-t0:.0f}s", flush=True)
ts=[]
for _i in range(3):
    t0=time.perf_counter(); _=float(np.asarray(call(*args))); ts.append((time.perf_counter()-t0)*1000/REPS)
print(f"static-kernel [{mode}]: {min(ts):.1f} ms/iter")
