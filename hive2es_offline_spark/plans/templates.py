"""ES search templates: mustache-parameterized query bodies.

Consumers of the index the reference publishes store search templates and
render them with per-request params (`_search/template`).  This module
renders the practical mustache subset over dict-form templates so the
rendered body feeds straight into ``es_search`` / ``es_scored_search``:

- ``{{var}}``: a string value that IS exactly one placeholder takes the
  param's VALUE with its type preserved (numbers stay numbers, lists stay
  lists — the shape ES templates rely on for ``"size": "{{size}}"``);
  placeholders embedded in longer strings interpolate ``str(value)``.
- ``{{#toJson}}var{{/toJson}}``: the param JSON-encoded in place (arrays
  / objects into query positions).
- ``{{var}}{{^var}}default{{/var}}``: mustache's inverted section as the
  default-value idiom — the literal default is used when the param is
  missing/empty.

Missing params without a default render as ES does: empty string for
interpolations; an exact-placeholder value raises (a query clause with a
silently-empty value is a misfire, not a search).
"""

from __future__ import annotations

import json
import re

__all__ = ["render_search_template"]

_EXACT = re.compile(r"^\{\{(\w+)\}\}$")
_TOJSON = re.compile(r"^\{\{#toJson\}\}(\w+)\{\{/toJson\}\}$")
_INLINE_TOJSON = re.compile(r"\{\{#toJson\}\}(\w+)\{\{/toJson\}\}")
_DEFAULTED = re.compile(r"^\{\{(\w+)\}\}\{\{\^\1\}\}(.*)\{\{/\1\}\}$")
_INLINE = re.compile(r"\{\{(\w+)\}\}")


def _render_value(v, params: dict):
    if isinstance(v, dict):
        return {k: _render_value(x, params) for k, x in v.items()}
    if isinstance(v, list):
        return [_render_value(x, params) for x in v]
    if not isinstance(v, str):
        return v
    m = _TOJSON.match(v)
    if m:
        name = m.group(1)
        if name not in params:
            raise ValueError(f"search template: missing param {name!r}")
        return json.loads(json.dumps(params[name]))
    m = _DEFAULTED.match(v)
    if m:
        name, default = m.group(1), m.group(2)
        val = params.get(name)
        return val if val not in (None, "") else default
    m = _EXACT.match(v)
    if m:
        name = m.group(1)
        if name not in params:
            raise ValueError(f"search template: missing param {name!r}")
        return params[name]  # type-preserving
    def _text(name: str) -> str:
        # mustache renders scalars as JSON text, not Python repr: True ->
        # "true", lists -> '["a", "b"]' — a str() here would silently
        # mis-render into the query (code-review r8)
        val = params.get(name)
        if val is None:
            return ""  # missing inline param renders empty, like ES
        if isinstance(val, str):
            return val
        return json.dumps(val)

    def _tojson_text(name: str) -> str:
        if name not in params:
            raise ValueError(f"search template: missing param {name!r}")
        return json.dumps(params[name])

    # toJson sections embedded in longer strings interpolate their JSON in
    # place; any OTHER {{#...}}/{{^...}} section here is unrecognized and
    # must not leak literal mustache into the rendered query (ADVICE r8) —
    # matching the module's loud-rejection convention
    out = _INLINE_TOJSON.sub(lambda mm: _tojson_text(mm.group(1)), v)
    out = _INLINE.sub(lambda mm: _text(mm.group(1)), out)
    if re.search(r"\{\{[#^/]", out):
        raise ValueError(
            f"search template: unrecognized mustache section in {v!r} "
            "(only {{#toJson}}var{{/toJson}} and the "
            "{{var}}{{^var}}default{{/var}} idiom are supported)"
        )
    return out


def render_search_template(template: dict | str, params: dict | None = None) -> dict:
    """Render a search template (dict, or a JSON string of one) with
    ``params`` into a ready-to-run search body dict.  Accepts the ES
    envelope ``{"source": <template>, "params": {...}}`` — explicit
    ``params`` argument wins over envelope params."""
    if isinstance(template, str):
        template = json.loads(template)
    if "source" in template and not ("query" in template or "aggs" in template):
        env = template
        template = env["source"]
        if isinstance(template, str):
            template = json.loads(template)
        params = params if params is not None else env.get("params")
    return _render_value(template, params or {})
