from neko_tpu.envs.setup_env import load_env_dataset, load_envs

__all__ = ["load_envs", "load_env_dataset"]
