import time
import numpy as np
import jax, jax.numpy as jnp
from moda_tpu.config import DataInfo, MoDAConfig
from moda_tpu.fields.model import MoDAModel
from moda_tpu.train.optim import MoDAOptimizer
from moda_tpu.train.step import StepExtras, make_train_step

def run(tag, **cfgkw):
    n_pairs = 256
    base = dict(num_bones=25, img_size=512, nsample=4, ndepth=128,
                use_unc=True, feat_ndepth_grid=20, lineload=True)
    base.update(cfgkw)
    cfg = MoDAConfig(**base)
    num_fr = 64
    info = DataInfo(offset=(0, num_fr), intrinsics=((500.0, 500.0, 256.0, 256.0),))
    model = MoDAModel(cfg, info)
    params, mvars = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    P = cfg.img_size; bs2 = 2*n_pairs
    img = lambda c: jnp.asarray(rng.uniform(size=(bs2,c,P)).astype(np.float32))
    fid = rng.integers(0, num_fr-1, size=n_pairs); fid = np.concatenate([fid,fid+1]).astype(np.int32)
    batch = {"imgs": img(3), "masks": (img(1)>0.4).astype(jnp.float32),
             "vis2d": jnp.ones((bs2,1,P)), "flow": img(2)*0.1, "occ": img(1),
             "dp_feats": img(16), "kaug": jnp.tile(jnp.asarray([[1.,1.,0.,0.]]),(bs2,1)),
             "frameid": jnp.asarray(fid), "frameid_sub": jnp.asarray(fid),
             "dataid": jnp.zeros((bs2,), jnp.int32),
             "lineid": jnp.asarray(rng.integers(0,cfg.img_size,size=bs2), jnp.int32)}
    opt = MoDAOptimizer(cfg, total_steps=10000)
    st = opt.init(params)
    step = make_train_step(model, opt, nsample=cfg.nsample, ndepth=cfg.ndepth,
                           use_fine=False, use_dskin=True, use_bones=True, donate=True)
    ex = StepExtras(progress=jnp.asarray(0.5), loss_select=jnp.asarray(1),
        root_update=jnp.asarray(1.0), body_update=jnp.asarray(1.0),
        shape_update=jnp.asarray(0.0), cvf_update=jnp.asarray(0.0),
        sil_err_median=jnp.asarray(1e9), shape_samp=jnp.zeros((1000,3)),
        shape_samp_valid=jnp.asarray(0.0), embed_alpha=jnp.asarray(10.0))
    params, st, aux, _ = step(params, st, mvars, batch, ex, jax.random.key(0))
    jax.block_until_ready(aux["total_loss"])
    n=20; t0=time.perf_counter()
    for i in range(n):
        params, st, aux, _ = step(params, st, mvars, batch, ex, jax.random.key(i+1))
    jax.block_until_ready(aux["total_loss"])
    dt=(time.perf_counter()-t0)/n
    print(f"{tag:28s} {dt*1e3:7.2f} ms/step  {bs2*cfg.nsample/dt:9.0f} rays/s", flush=True)

run("baseline")
run("no_ot", use_ot=False)
run("no_embed(featmatch off)", use_embed=False)
run("no_unc", use_unc=False)
run("no_corresp(no flow)", use_corresp=False)
run("ndepth64", ndepth=64)
run("no_nerf_skin", nerf_skin=False)
run("grid10", feat_ndepth_grid=10)
