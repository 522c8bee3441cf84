import time, functools, jax, jax.numpy as jnp
from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig
from boxdreamer_tpu.models import predictor as P
from boxdreamer_tpu.ops import decode as decode_ops, pnp as pnp_ops

model = BoxDreamer(BoxDreamerConfig())
ks = jax.random.split(jax.random.PRNGKey(0), 8)
B, NR, S = 8, 5, 224
ref_images = jax.random.uniform(ks[0], (B, NR, 3, S, S))
ref_bf = jax.random.uniform(ks[1], (B, NR, 8, S, S))*2-1
bbox_3d = jax.random.normal(ks[2], (B, 8, 3))*0.1
Kin = jnp.broadcast_to(jnp.array([[900.,0,112],[0,900.,112],[0,0,1.]]), (B,3,3))
mask = jnp.zeros((1, NR+1), dtype=bool).at[:, -1].set(True)
init_images = jnp.concatenate([ref_images[:1], ref_images[:1,:1]], 1)
init_bf = jnp.concatenate([ref_bf[:1], ref_bf[:1,:1]], 1)
params = model.init(ks[3], init_images, init_bf, mask)
pred = P.Predictor(model, params)
pred.set_references(ref_images, ref_bf, bbox_3d)
refs = pred._refs
K_CH = 16

def chain_time(fn, *consts, q_shape=(B,3,S,S), name=""):
    qs = jax.random.uniform(ks[4], (K_CH,)+q_shape)
    @jax.jit
    def chain(qs, *consts):
        def step(c, qi):
            out = fn(qi + c*1e-12, *consts)
            s = jnp.sum(out.astype(jnp.float32))
            return s, s
        return jax.lax.scan(step, jnp.float32(0.), qs)
    jax.device_get(chain(qs, *consts))
    best=1e9
    for _ in range(3):
        t0=time.perf_counter(); jax.device_get(chain(qs,*consts)); best=min(best,time.perf_counter()-t0)
    print(f"{name}: {best/K_CH*1e3:.1f} ms/batch8 ({best/K_CH/B*1e3:.2f} ms/frame)")

# full
chain_time(lambda q: P.predict_query(model, params, q, refs['tokens'], refs['bbox_feat'], bbox_3d, Kin)['pred_poses'], name='full')
# encoder only
chain_time(lambda q: P.encoder_apply(model, params, q), name='dino encode')
# decoder only (tokens input)
tok6 = jnp.concatenate([refs['tokens'], refs['tokens'][:, :1]], 1)
bf6 = jnp.concatenate([refs['bbox_feat'], jnp.zeros_like(refs['bbox_feat'][:, :1])], 1)
cmask = jnp.zeros((B, NR+1), dtype=bool).at[:, -1].set(True)
chain_time(lambda t: P.decoder_apply(model, params, bf6, cmask, t), q_shape=(B, NR+1, 256, 768), name='betr decode')
# decode+pnp only
hm = jax.random.uniform(ks[5], (B, 8, S, S))*2-1
def dp(h):
    _, kpts = decode_ops.decode_bbox_features(h, 'heatmap', k=20)
    return pnp_ops.solve_pnp(bbox_3d, kpts, Kin, iters=20)
chain_time(dp, q_shape=(B,8,S,S), name='decode+pnp')
