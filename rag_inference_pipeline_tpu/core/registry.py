"""Component registry: name -> instance map with lifecycle hooks.

Parity with the reference's DI layer (reference:
src/pipeline/component_registry.py:9-126): register runs `load()` eagerly,
`start_all`/`stop_all` are async with reverse-order stop, `unload_all` frees
weights/device arrays; alias table resolves profile aliases to instances.
"""

from __future__ import annotations

import inspect
import logging
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)


class Component:
    """Optional base class; duck typing is sufficient for registration."""

    def load(self) -> None:  # blocking weight/index load + warmup
        pass

    def unload(self) -> None:
        pass

    async def start(self) -> None:  # spawn background workers
        pass

    async def stop(self) -> None:
        pass

    @property
    def is_loaded(self) -> bool:
        return True


class ComponentRegistry:
    def __init__(self) -> None:
        self._components: Dict[str, Any] = {}
        self._aliases: Dict[str, str] = {}
        self._order: List[str] = []

    def register(self, name: str, component: Any, *, load: bool = True) -> Any:
        if name in self._components:
            raise ValueError(f"component '{name}' already registered")
        self._components[name] = component
        self._order.append(name)
        if load and hasattr(component, "load"):
            logger.info("loading component %s (%s)", name, type(component).__name__)
            component.load()
        return component

    def alias(self, alias: str, target: str) -> None:
        if alias in self._components or alias in self._aliases:
            raise ValueError(f"alias '{alias}' collides with existing name")
        if target not in self._components:
            raise KeyError(f"alias target '{target}' not registered")
        self._aliases[alias] = target

    def get(self, name: str) -> Any:
        name = self._aliases.get(name, name)
        return self._components[name]

    def get_optional(self, name: str) -> Optional[Any]:
        try:
            return self.get(name)
        except KeyError:
            return None

    def __contains__(self, name: str) -> bool:
        return name in self._components or name in self._aliases

    @property
    def names(self) -> List[str]:
        return list(self._order)

    async def start_all(self) -> None:
        for name in self._order:
            comp = self._components[name]
            if hasattr(comp, "start"):
                res = comp.start()
                if inspect.isawaitable(res):
                    await res

    async def stop_all(self) -> None:
        for name in reversed(self._order):
            comp = self._components[name]
            if hasattr(comp, "stop"):
                try:
                    res = comp.stop()
                    if inspect.isawaitable(res):
                        await res
                except Exception:  # noqa: BLE001 — shutdown must not cascade
                    logger.exception("error stopping component %s", name)

    def unload_all(self) -> None:
        for name in reversed(self._order):
            comp = self._components[name]
            if hasattr(comp, "unload"):
                try:
                    comp.unload()
                except Exception:  # noqa: BLE001
                    logger.exception("error unloading component %s", name)

    def health(self) -> dict[str, bool]:
        """Per-component readiness (reference runtime_factory.py:284-303)."""
        out: dict[str, bool] = {}
        for name in self._order:
            comp = self._components[name]
            out[name] = bool(getattr(comp, "is_loaded", True))
        return out
