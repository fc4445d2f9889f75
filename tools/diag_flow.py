import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=1'
import jax
jax.config.update('jax_platforms','cpu')
import jax.numpy as jnp, numpy as np
from moda_tpu.config import DataInfo, MoDAConfig
from moda_tpu.data.synthetic import SynthScene
from moda_tpu.fields.model import MoDAModel
from moda_tpu.train.optim import MoDAOptimizer
from moda_tpu.train.step import StepExtras, make_train_step

S=32; NF=8
scene = SynthScene(img_size=S, num_frames=NF)
cfg = MoDAConfig(num_bones=4, img_size=S, nsample=32, ndepth=32, num_epochs=1,
                 feat_ndepth_grid=8, use_cam=True, eikonal_wt=0.0)
f = scene.focal*S/2
info = DataInfo(offset=(0,NF), intrinsics=((f,f,S/2,S/2),))
model = MoDAModel(cfg, info)
params, mvars = model.init(jax.random.key(0))
batch_np = scene.make_batch([(0,1),(2,3)])
batch = {k: jnp.asarray(v) for k,v in batch_np.items()}
rtk = np.stack([scene.render_frame(i)["rtk"] for i in range(NF)])
base = np.tile(np.eye(4,dtype=np.float32)[None],(NF,1,1))[:, :3]
base[:, :3] = rtk[:, :3]; base[:, :3, 3] /= model.obj_scale
opt = MoDAOptimizer(cfg, total_steps=400)
st = opt.init(params)
step = make_train_step(model, opt, nsample=cfg.nsample, ndepth=cfg.ndepth,
                       use_fine=False, use_dskin=False, use_bones=True, donate=False)
ex = StepExtras(progress=jnp.asarray(0.5), loss_select=jnp.asarray(1),
    root_update=jnp.asarray(1.0), body_update=jnp.asarray(1.0),
    shape_update=jnp.asarray(0.0), cvf_update=jnp.asarray(0.0),
    sil_err_median=jnp.asarray(1e9), shape_samp=jnp.zeros((64,3)),
    shape_samp_valid=jnp.asarray(0.0), embed_alpha=jnp.asarray(10.0),
    base_rt=jnp.asarray(base))
p, s = params, st
for i in range(300):
    p, s, aux, _ = step(p, s, mvars, batch, ex, jax.random.key(i))
    if i % 50 == 0 or i == 299:
        print(i, {k: round(float(aux[k]),4) for k in
                  ('total_loss','img_loss','sil_loss','flo_loss','cyc_loss','proj_loss','grad_finite')})
