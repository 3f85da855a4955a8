"""Standalone ComfyUI-workflow-JSON executor.

The reference runs inside ComfyUI's graph runtime (layer L6 in SURVEY.md §1)
— here the framework ships its own single-controller executor so the
reference's example workflows (`example_workflows/*.json`, the de-facto
acceptance tests per SURVEY.md §4) run headlessly on TPU with no external
host app. Supports the standard editor JSON format: `nodes` with
`widgets_values` + `inputs` link references, `links` rows
[id, from_node, from_slot, to_node, to_slot, type].
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

from .base import NODE_CLASS_MAPPINGS


class WorkflowError(RuntimeError):
    pass


def _widget_input_names(cls) -> list:
    """Names of INPUT_TYPES entries that come from widgets (non-link
    types), in declaration order; link-typed entries are resolved from
    graph edges."""
    spec = cls.INPUT_TYPES()
    names = []
    for section in ("required", "optional"):
        for name, decl in spec.get(section, {}).items():
            t = decl[0] if isinstance(decl, (tuple, list)) else decl
            if isinstance(t, list) or t in ("STRING", "INT", "FLOAT",
                                            "BOOLEAN"):
                names.append((name, section, t, decl))
            else:
                names.append((name, section, None, decl))
    return names


def run_workflow(workflow: Dict | str, overrides: Optional[Dict] = None,
                 verbose: bool = False) -> Dict[int, Any]:
    """Execute a workflow; returns {node_id: outputs tuple}.

    overrides: {node_id: {input_name: value}} — test hook for swapping
    widget values (e.g. smaller resolutions) without editing the JSON.
    """
    if isinstance(workflow, str):
        with open(workflow) as fh:
            workflow = json.load(fh)
    overrides = overrides or {}

    from ..profiling import maybe_trace, trace_enabled
    if trace_enabled():
        with maybe_trace("workflow"):
            return _run_workflow(workflow, overrides, verbose)
    return _run_workflow(workflow, overrides, verbose)


def _run_workflow(workflow: Dict, overrides: Dict,
                  verbose: bool) -> Dict[int, Any]:

    nodes = {n["id"]: n for n in workflow["nodes"]
             if n.get("mode", 0) != 2}          # mode 2 = muted
    links = {}
    for row in workflow.get("links", []):
        link_id, src, src_slot, dst, dst_slot, _type = row[:6]
        links[link_id] = (src, src_slot)

    # dependency edges
    deps: Dict[int, set] = {nid: set() for nid in nodes}
    for n in nodes.values():
        for inp in n.get("inputs", []) or []:
            if inp.get("link") is not None and inp["link"] in links:
                deps[n["id"]].add(links[inp["link"]][0])

    order = []
    seen: set = set()

    def visit(nid, stack=()):
        if nid in seen:
            return
        if nid in stack:
            raise WorkflowError(f"cycle at node {nid}")
        for d in deps.get(nid, ()):  # noqa: B023
            if d in nodes:
                visit(d, stack + (nid,))
        seen.add(nid)
        order.append(nid)

    for nid in nodes:
        visit(nid)

    results: Dict[int, Any] = {}
    for nid in order:
        n = nodes[nid]
        type_name = n["type"]
        cls = NODE_CLASS_MAPPINGS.get(type_name)
        if cls is None:
            raise WorkflowError(f"unknown node type {type_name!r} "
                                f"(node {nid})")
        link_inputs = {}
        for inp in n.get("inputs", []) or []:
            if inp.get("link") is not None and inp["link"] in links:
                src, slot = links[inp["link"]]
                if src not in results:
                    raise WorkflowError(
                        f"node {nid} depends on unexecuted node {src}")
                src_out = results[src]
                link_inputs[inp["name"]] = src_out[slot]

        widgets = list(n.get("widgets_values") or [])
        kwargs = {}
        for name, section, widget_type, decl in _widget_input_names(cls):
            if name in link_inputs:
                # "convert widget to input": the widget's placeholder
                # value STAYS in widgets_values — consume it so later
                # widgets don't shift one slot left
                if widget_type is not None and widgets:
                    widgets.pop(0)
                    if name in ("seed", "noise_seed") and widgets and \
                            isinstance(widgets[0], str):
                        widgets.pop(0)
                kwargs[name] = link_inputs[name]
                continue
            if widget_type is not None and widgets:
                val = widgets.pop(0)
                # ComfyUI appends control_after_generate after seed widgets
                if name in ("seed", "noise_seed") and widgets and \
                        isinstance(widgets[0], str):
                    widgets.pop(0)
                kwargs[name] = val
            elif section == "optional":
                continue
        kwargs.update(overrides.get(nid, {}))

        fn = getattr(cls(), cls.FUNCTION)
        if verbose:
            print(f"[graph] #{nid} {type_name}")
        out = fn(**kwargs)
        if isinstance(out, dict):          # OUTPUT_NODE ui convention
            out = out.get("result", ())
        results[nid] = out
    return results


def load_node_mappings():
    """Import all node modules (populates NODE_CLASS_MAPPINGS)."""
    from . import (nodes_charactergen, nodes_crm,  # noqa: F401
                   nodes_diffusers, nodes_hunyuan3d, nodes_io,
                   nodes_models, nodes_mvadapter, nodes_mvdiffusion,
                   nodes_partcrafter, nodes_preprocess, nodes_render,
                   nodes_stablegen, nodes_texture, nodes_trellis,
                   nodes_vendor)
    return NODE_CLASS_MAPPINGS
