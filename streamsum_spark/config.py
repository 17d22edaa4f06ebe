"""Declarative pipeline configuration.

The reference configures the pipeline with *executable* Clojure
(`load-file`, /root/reference/src-clj/streamsum/system.clj:32-38) providing
a `deftransform` pattern list and a `:cache-config` map
(/root/reference/example/streamsum/config.clj:7-21, 81-90).  We keep the
same two concepts but as plain data (no code execution surface):

- ``TransformPattern``: predicate value -> list of output tuple templates.
  Each template names the destination cache and says which event fields land
  in the ``key`` / ``val`` slots; count-shaped templates additionally carry
  an ``action`` (the reference nests ``[action obj]`` in the value slot —
  doc/tuple-counts.md:25; we flatten it to a column, SURVEY.md §1.1).
- ``CacheSpec``: cache name -> discipline (assoc | lastn | count | keycount),
  mirroring `:cache-config` {cache-key [type descr]}.

The default config below plays the role of
/root/reference/example/streamsum/config.clj over the driver's ``events``
vocabulary (click/view/purchase/signup/error), with the same structural
shape as the reference's five example patterns: a 2-tuple fan-out feeding an
assoc + a lastn cache, a second predicate feeding the same lastn cache, a
second 2-tuple fan-out, a single lastn pattern, and a count-shaped pattern.
We additionally route click/purchase into the count cache so the read-side
query API (§2.B) has multiple actions to merge across.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TupleTemplate:
    """One output tuple of a pattern: (cache, key_field, val_field[, action]).

    ``key_field``/``val_field`` name fields of the extracted 4-tuple
    ("subj" or "obj").  ``action`` is set only for count-shaped outputs.
    """

    cache: str
    key_field: str
    val_field: str
    action: str | None = None


@dataclass(frozen=True)
class TransformPattern:
    pred: str
    outputs: tuple[TupleTemplate, ...]


@dataclass(frozen=True)
class CacheSpec:
    name: str
    kind: str  # assoc | lastn | count | keycount
    description: str = ""


@dataclass(frozen=True)
class PipelineConfig:
    patterns: tuple[TransformPattern, ...]
    caches: tuple[CacheSpec, ...]
    lastn_buf_size: int = 20  # reference default, caches.clj:98 / config.clj:95

    def cache_names(self, kind: str | None = None) -> list[str]:
        return [c.name for c in self.caches if kind is None or c.kind == kind]

    def caches_by_name(self) -> dict[str, CacheSpec]:
        return {c.name: c for c in self.caches}


_KNOWN_KINDS = ("assoc", "lastn", "count", "keycount")


def config_from_dict(d: dict) -> PipelineConfig:
    """Build a PipelineConfig from plain data (parsed JSON/YAML/TOML) —
    the reference's config file, minus the code-execution surface
    (system.clj:32-38 ``load-file``s executable Clojure; we accept only
    data).  Shape validation mirrors validate-config (system.clj:40-51):
    every problem raises ValueError naming the offending entry.

    Expected shape::

        {"patterns": [{"pred": "click",
                       "outputs": [{"cache": "c", "key_field": "subj",
                                    "val_field": "obj", "action": null}]}],
         "caches":   [{"name": "c", "kind": "lastn", "description": ""}],
         "lastn_buf_size": 20}

    Unknown cache ``kind``s are allowed here (the cache-factory SPI can
    register them at build time); build_caches raises if no factory
    matches.  A pattern output routed to an UNDECLARED cache is an error
    — the reference drops such tuples silently at record! time
    (caches.clj:166-170), but in a declared-config engine that is a
    config bug worth failing fast on.
    """
    caches = tuple(
        CacheSpec(c["name"], c["kind"], c.get("description", ""))
        for c in d.get("caches", ())
    )
    if not caches:
        raise ValueError("config.caches must declare at least one cache")
    names = {c.name for c in caches}
    patterns = []
    for p in d.get("patterns", ()):
        outputs = []
        for o in p.get("outputs", ()):
            for fld in ("cache", "key_field", "val_field"):
                if fld not in o:
                    raise ValueError(f"pattern {p.get('pred')!r}: output missing {fld!r}")
            if o["cache"] not in names:
                raise ValueError(
                    f"pattern {p.get('pred')!r} routes to undeclared cache {o['cache']!r}"
                )
            if o["key_field"] not in ("subj", "obj") or o["val_field"] not in ("subj", "obj"):
                raise ValueError(
                    f"pattern {p.get('pred')!r}: key/val fields must be 'subj' or 'obj'"
                )
            outputs.append(
                TupleTemplate(o["cache"], o["key_field"], o["val_field"], o.get("action"))
            )
        if not outputs:
            raise ValueError(f"pattern {p.get('pred')!r} has no outputs")
        patterns.append(TransformPattern(p["pred"], tuple(outputs)))
    if not patterns:
        raise ValueError("config.patterns must declare at least one pattern")
    return PipelineConfig(
        patterns=tuple(patterns),
        caches=caches,
        lastn_buf_size=int(d.get("lastn_buf_size", 20)),
    )


def config_to_dict(cfg: PipelineConfig) -> dict:
    """Inverse of config_from_dict (round-trip stable)."""
    return {
        "patterns": [
            {
                "pred": p.pred,
                "outputs": [
                    {
                        "cache": t.cache,
                        "key_field": t.key_field,
                        "val_field": t.val_field,
                        "action": t.action,
                    }
                    for t in p.outputs
                ],
            }
            for p in cfg.patterns
        ],
        "caches": [
            {"name": c.name, "kind": c.kind, "description": c.description}
            for c in cfg.caches
        ],
        "lastn_buf_size": cfg.lastn_buf_size,
    }


# Structural mirror of config.clj:7-21 over the driver's event vocabulary.
DEFAULT_CONFIG = PipelineConfig(
    patterns=(
        # Every pattern additionally routes a subject-counts tuple so the
        # keycount cache is fed through the SAME dispatch-by-cache-key path
        # as every other cache (reference record! dispatch, caches.clj:158;
        # config.clj:88 "number of times each subject appears") — no cache
        # reads the un-routed stream.
        # CREATE_CHAT-like: 2-way fan-out (assoc + lastn) — config.clj:9-10
        TransformPattern(
            "click",
            (
                TupleTemplate("click-obj-user", "obj", "subj"),
                TupleTemplate("act-user-obj", "subj", "obj"),
                TupleTemplate("interactions-user-obj", "subj", "obj", action="click"),
                TupleTemplate("subject-counts", "subj", "subj"),
            ),
        ),
        # REPLY_CHAT-like: feeds the same lastn cache — config.clj:12
        TransformPattern(
            "view",
            (
                TupleTemplate("act-user-obj", "subj", "obj"),
                TupleTemplate("subject-counts", "subj", "subj"),
            ),
        ),
        # CREATE_DOC-like: 2-way fan-out — config.clj:14-15
        TransformPattern(
            "purchase",
            (
                TupleTemplate("own-obj-user", "obj", "subj"),
                TupleTemplate("own-user-obj", "subj", "obj"),
                TupleTemplate("interactions-user-obj", "subj", "obj", action="buy"),
                TupleTemplate("subject-counts", "subj", "subj"),
            ),
        ),
        # ANNOTATE_DOC-like: single lastn — config.clj:17
        TransformPattern(
            "signup",
            (
                TupleTemplate("note-user-obj", "subj", "obj"),
                TupleTemplate("subject-counts", "subj", "subj"),
            ),
        ),
        # STAR_MESSAGE-like: count-shaped [action obj] value — config.clj:19
        TransformPattern(
            "error",
            (
                TupleTemplate("interactions-user-obj", "subj", "obj", action="error"),
                TupleTemplate("subject-counts", "subj", "subj"),
            ),
        ),
    ),
    caches=(
        CacheSpec("click-obj-user", "assoc", "last user to click each object"),
        CacheSpec("act-user-obj", "lastn", "last N objects a user acted on"),
        CacheSpec("own-obj-user", "assoc", "last purchaser of each object"),
        CacheSpec("own-user-obj", "lastn", "last N objects a user purchased"),
        CacheSpec("note-user-obj", "lastn", "last N objects a user signed up for"),
        CacheSpec(
            "interactions-user-obj",
            "count",
            "count of user-object interactions of various types, keyed by user",
        ),
        CacheSpec("subject-counts", "keycount", "updates per subject across the stream"),
    ),
)
