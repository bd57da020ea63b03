from neko_tpu.tasks.base import Task
from neko_tpu.tasks.control import ControlTask
from neko_tpu.tasks.text import TextTask

__all__ = ["Task", "ControlTask", "TextTask"]
