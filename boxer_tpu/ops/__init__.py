from boxer_tpu.ops.box_attention import (
    box_attention,
    box_attention_dispatch,
    instance_attention,
    set_box_attention_impl,
    get_box_attention_impl,
)

__all__ = [
    "box_attention",
    "box_attention_dispatch",
    "instance_attention",
    "set_box_attention_impl",
    "get_box_attention_impl",
]
