"""Minimal gradio API mock for interface-construction tests (no gradio in
this image). Records components and wired events."""

from __future__ import annotations

from typing import Any, Dict, List


class _Ctx:
    def __init__(self, registry, kind, **kwargs):
        self.kind = kind
        self.kwargs = kwargs
        self._registry = registry
        registry["components"].append(self)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _Component(_Ctx):
    def _wire(self, event, fn, inputs=None, outputs=None):
        self._registry["events"].append(
            {
                "component": self.kind,
                "label": self.kwargs.get("label") or self.kwargs.get("value"),
                "event": event,
                "fn": fn,
                "inputs": inputs,
                "outputs": outputs,
            }
        )
        return self

    def click(self, fn, inputs=None, outputs=None, **_):
        return self._wire("click", fn, inputs, outputs)

    def select(self, fn, inputs=None, outputs=None, **_):
        return self._wire("select", fn, inputs, outputs)

    def change(self, fn, inputs=None, outputs=None, **_):
        return self._wire("change", fn, inputs, outputs)


class SelectData:
    def __init__(self, index):
        self.index = index


class GradioMock:
    """Usable as the ``gr_module`` argument of build_interface."""

    def __init__(self):
        self.registry: Dict[str, List[Any]] = {"components": [], "events": []}
        self.SelectData = SelectData

    def _make(self, kind):
        def factory(*args, **kwargs):
            if args and "label" not in kwargs and isinstance(args[0], str):
                kwargs["label"] = args[0]
            return _Component(self.registry, kind, **kwargs)

        return factory

    def __getattr__(self, name):
        # Blocks/Tab/Row/Column/Accordion behave as context managers;
        # everything else is a component factory.
        return self._make(name)
