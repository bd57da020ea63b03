import numpy as np, jax, time
from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.parallel import sharding as shd
from neko_tpu.parallel.mesh import create_mesh
from neko_tpu.training.train_state import OptimizerConfig, TrainContext
from bench import build_batch

cfg = ModelConfig(embed_dim=768, layers=6, heads=24, dropout=0.1,
                  context_len=1024, max_patches=26*36, dtype="bfloat16")
opt = OptimizerConfig(learning_rate=1e-4, init_lr=1e-7, warmup_steps=100, training_steps=10000)
mesh = create_mesh(model=1)
ctx = TrainContext(cfg, opt, mesh, seed=0)
packer = SequencePacker(cfg)
arrays = build_batch(packer, cfg, 16)
batch = shd.shard_batch(mesh, to_device_batch(arrays))
state = ctx.init_state(batch)
for _ in range(3):
    state, loss = ctx.train_step(state, batch)
float(loss)
jax.profiler.start_trace("/tmp/neko_trace3")
for _ in range(3):
    state, loss = ctx.train_step(state, batch)
float(loss)
jax.profiler.stop_trace()
print("trace done")
