from .dist import (make_mesh, make_dist_renderer, make_dist_progressive,
                   make_train_step, trainable_filter_grads)
from .init import init_distributed, make_host_mesh

__all__ = ["make_mesh", "make_dist_renderer", "make_dist_progressive",
           "make_train_step", "trainable_filter_grads", "init_distributed",
           "make_host_mesh"]
