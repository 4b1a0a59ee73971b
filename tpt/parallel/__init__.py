from .dist import (make_mesh, make_dist_renderer, make_train_step,
                   trainable_filter_grads)

__all__ = ["make_mesh", "make_dist_renderer", "make_train_step",
           "trainable_filter_grads"]
