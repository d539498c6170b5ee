"""Module base — the unit of compute.

Reference: Module lifecycle driver (/root/reference/src/module.cc:47-200)
enforcing deserialize-candidate -> validate -> commit -> define -> input
checks -> create -> output verification, with taints
(include/jetstream/module.hh:53-63) and reconfigure-with-rollback.

TPU-first redesign: a module's compute is a *pure function*

    apply(inputs: dict[str, Array], state) -> (outputs, new_state)

traced by the flowgraph compiler into one fused jitted program per
segment, instead of a per-module ``computeSubmit`` interpreted by a
scheduler loop.  Stateful streaming modules (FM discriminator, AGC,
overlap-add history, …) carry explicit state pytrees threaded through the
compiled step with buffer donation.  Host modules (sources/sinks)
implement ``host_*`` hooks instead and pace the dispatch loop — the
analog of ``hasPendingCompute``
(src/domains/io/soapy/module_impl_native_cpu.cc:39-56).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from cyberether_tpu.core.params import Schema, config_hash
from cyberether_tpu.core.tensor import TensorSpec
from cyberether_tpu.core.types import (
    Device,
    Runtime,
    MissingInputError,
    Taint,
    ValidationError,
)

# Reserved output name for skip gating (squelch): a scalar bool array.
# Downstream validity = AND of input validities and this flag; stateful
# modules' states are frozen (jnp.where) on skipped cycles.
PASS_FLAG = "__pass__"


class Module:
    # -- static declarations (overridden by subclasses) --------------------
    module_type: str = ""
    device: Device = Device.TPU
    runtime: Runtime = Runtime.JAX
    provider: str = "generic"
    taints: Taint = Taint.NONE
    schema: Schema = Schema()

    #: declared port names; () means "derived in define()"
    input_ports: Tuple[str, ...] = ()
    output_ports: Tuple[str, ...] = ()
    #: config fields that only affect present_data (live view params:
    #: zoom/offset...) — updatable in place via
    #: ``Flowgraph.block_set_view`` without recreating the module (the
    #: reference's reload-free waterfall interaction,
    #: src/domains/visualization/waterfall/)
    view_fields: Tuple[str, ...] = ()

    def __init__(self, name: str, raw_config: Optional[Dict[str, Any]],
                 input_specs: Dict[str, TensorSpec]):
        self.name = name
        # 1. deserialize candidate + commit (two-phase in the reference;
        #    rollback here is handled by the caller keeping the old module)
        self.config: Dict[str, Any] = self.schema.decode(raw_config)
        self.config_hash = config_hash(self.config)
        self.input_specs: Dict[str, TensorSpec] = dict(input_specs)
        # 2. define (ports / taints may depend on config)
        self.define()
        # 3a. missing-port check first: an unwired input is WAITING
        #     (INCOMPLETE + retry), and validate() implementations
        #     index input_specs directly
        self._check_ports_present()
        # 3b. validate BEFORE the remaining framework checks so a
        #     definite config error surfaces as its own diagnostic
        self.validate()
        # 3c. remaining framework input checks (module.cc:108-150)
        self._check_inputs()
        # 4. create -> output specs
        self.output_specs: Dict[str, TensorSpec] = self.create()
        for port, spec in self.output_specs.items():
            if port == PASS_FLAG or port.startswith("metric:"):
                # reserved names: the scheduler strips these keys from
                # apply() outputs, so a wired consumer would KeyError
                # deep inside jit tracing (r5 review finding)
                raise ValidationError(
                    f"module '{name}' declares reserved output "
                    f"name '{port}'")
            if not spec.valid():
                raise ValidationError(
                    f"module '{name}' produced invalid output spec "
                    f"'{port}': {spec.shape}")

    # -- lifecycle hooks ---------------------------------------------------
    def define(self) -> None:
        """Adjust ports/taints based on committed config (optional)."""

    def validate(self) -> None:
        """Reject bad configs/inputs by raising ValidationError."""

    def create(self) -> Dict[str, TensorSpec]:
        """Return output port -> TensorSpec."""
        raise NotImplementedError

    def reconfigure(self, new_raw_config: Dict[str, Any]) -> bool:
        """Reserved for an in-place reconfigure fast path.  The graph
        layer currently ALWAYS tears down and recreates on
        reconfigure (Flowgraph.block_reconfigure — matching
        Result::RECREATE, the default for nearly all reference
        modules), so overriding this has no effect today; streaming
        state survives recreation via the scheduler's
        state-compatibility carry-over instead."""
        return False

    # -- framework checks --------------------------------------------------
    def _check_ports_present(self) -> None:
        for port in self.input_ports:
            if port not in self.input_specs:
                raise MissingInputError(
                    f"module '{self.name}' missing input '{port}'")

    def _check_inputs(self) -> None:
        # NOTE on the reference's device-match check (module.cc:108-150
        # + Taint.CROSS_DEVICE): cross-device links are a first-class
        # capability here — the segment compiler partitions by device
        # key and device_puts boundary values onto the consumer's
        # backend — so there is nothing to reject at build time.
        for port in self.input_ports:
            spec = self.input_specs[port]
            if not spec.valid():
                raise ValidationError(
                    f"module '{self.name}' input '{port}' has empty shape "
                    f"{spec.shape}")
        extra = set(self.input_specs) - set(self.input_ports)
        if extra and self.input_ports:
            raise ValidationError(
                f"module '{self.name}' got unknown inputs {sorted(extra)}")

    # -- compute (device path) ---------------------------------------------
    def init_state(self) -> Any:
        """Initial state pytree (arrays) or None for stateless modules."""
        return None

    def apply(self, inputs: Dict[str, Any], state: Any
              ) -> Tuple[Dict[str, Any], Any]:
        """Pure compute traced under jit.  Must be side-effect free."""
        raise NotImplementedError

    # -- host path (sources / sinks / python modules) ----------------------
    def host_start(self) -> None:
        """Called once when the graph starts (open files/devices)."""

    def host_stop(self) -> None:
        """Called on graph teardown."""

    def host_poll(self) -> Optional[Dict[str, Any]]:
        """Sources: return a dict of numpy arrays for each output port, or
        None if no data is ready yet (pacing — ``hasPendingCompute``)."""
        return None

    def host_output_version(self) -> Optional[int]:
        """Sources may return a monotonically increasing version for
        their outputs; the scheduler then reuses the uploaded device
        copy while the version is unchanged.  None (default) means the
        outputs may change every cycle and are re-uploaded."""
        return None

    def host_consume(self, outputs: Dict[str, Any], valid: bool) -> None:
        """Sinks: receive device outputs fetched to host."""

    # -- presentation (SURFACE modules) ------------------------------------
    def present_data(self, outputs: Dict[str, Any], state: Any
                     ) -> Optional[Dict[str, Any]]:
        """Return displayable host arrays (e.g. an RGBA frame) or None."""
        return None

    # -- misc ---------------------------------------------------------------
    @property
    def is_source(self) -> bool:
        return bool(self.taints & Taint.HOST_SOURCE)

    @property
    def is_sink(self) -> bool:
        return bool(self.taints & Taint.HOST_SINK)

    @property
    def is_static(self) -> bool:
        return bool(self.taints & Taint.STATIC_OUTPUT)

    @property
    def is_surface(self) -> bool:
        return bool(self.taints & Taint.SURFACE)

    def __repr__(self) -> str:  # pragma: no cover
        return (f"<{type(self).__name__} '{self.name}' "
                f"({self.module_type})>")
