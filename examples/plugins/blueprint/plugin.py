"""Blueprint plugin: a simple gain block.

Mirrors the reference plugin SDK example
(/root/reference/examples/plugins/blueprint — a gain block packed into
a .cep bundle).
"""

from typing import Dict

import jax.numpy as jnp

from cyberether_tpu.core.block import simple_block
from cyberether_tpu.core.module import Module
from cyberether_tpu.core.params import Field, Schema
from cyberether_tpu.core.registry import register_block, register_module
from cyberether_tpu.core.tensor import TensorSpec
from cyberether_tpu.core.types import Taint


@register_module
class GainModule(Module):
    module_type = "gain"
    taints = Taint.STATELESS
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(Field("gain", "float", 1.0))

    def create(self) -> Dict[str, TensorSpec]:
        return {"buffer": self.input_specs["buffer"]}

    def apply(self, inputs, state):
        x = inputs["buffer"]
        return {"buffer": x * jnp.asarray(self.config["gain"],
                                          x.dtype)}, state


register_block(simple_block("gain", summary="Multiplies by a constant "
                            "gain (blueprint plugin example)."))
