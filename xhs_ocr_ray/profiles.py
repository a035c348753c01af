"""Extraction profiles — the analog of the reference's mask library + declared
field schema (SURVEY.md §1.3-1.4; reference mask loop core/run.py:363-501,
config.ini [tags]).

A *profile* is one way to extract a document class: an optional span mask
(keep-selectors over the DOM — the alpha-mask analog), an optional field
schema (ordered regexes whose i-th match binds to the i-th declared field —
positional binding, db/__init__.py:111-120), and normalization flags.
Profiles for a doc_class are tried **in profile_id order until one
validates** (cardinality check M8, core/run.py:486-501); a document failing
all profiles is quarantined with ``status='failed_all_profiles'`` (the
reference logs and drops, core/run.py:499-501 — we keep the row for lineage).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from xhs_ocr_ray.functions.normalize import normalize_lines, pair_lines
from xhs_ocr_ray.html.extract import _render_container, select_main
from xhs_ocr_ray.html.fast_parser import parse_html_safe as parse_html
from xhs_ocr_ray.html.parser import Element


@dataclass(frozen=True)
class Profile:
    doc_class: str
    profile_id: int
    keep_selectors: tuple[str, ...] = ()      # span mask: "tag", ".cls", "tag.cls"
    field_names: tuple[str, ...] = ()         # declared schema (ordered)
    field_regexes: tuple[str, ...] = ()       # i-th regex → i-th field
    normalize: bool = False                   # apply M6 normalizer to lines
    strip_cjk: bool = False                   # M6 CJK-strip toggle
    pair_fields: int = 0                      # M7: zip 2k lines → "k:v|k:v"
    layout_parser: str = "multi_para"         # parser for layout payloads

    def __post_init__(self) -> None:
        if self.field_regexes and len(self.field_regexes) != len(self.field_names):
            raise ValueError("field_regexes and field_names must align")


@dataclass
class ProfileLibrary:
    """Ordered profiles per doc_class + a default catch-all."""

    profiles: dict[str, list[Profile]] = field(default_factory=dict)

    def add(self, profile: Profile) -> None:
        self.profiles.setdefault(profile.doc_class, []).append(profile)
        self.profiles[profile.doc_class].sort(key=lambda p: p.profile_id)

    def for_class(self, doc_class: str) -> list[Profile]:
        got = self.profiles.get(doc_class)
        if got:
            return got
        return self.profiles.get("default", [DEFAULT_PROFILE])

    # -- declarative on-disk form (reference: config.ini [tags]/[fields],
    #    parsed at core/run.py:434-438 / db/data_sync.py:15-19 — the
    #    extraction schema is DATA; adding a doc_class must not need a
    #    code change) ------------------------------------------------------

    def to_obj(self) -> dict:
        """JSON-able form; field order is the positional-binding contract
        (M11), preserved via the ordered ``fields`` mapping."""
        out = []
        for _, profs in sorted(self.profiles.items()):
            for p in profs:
                d: dict = {"doc_class": p.doc_class, "profile_id": p.profile_id}
                if p.keep_selectors:
                    d["keep_selectors"] = list(p.keep_selectors)
                if p.field_names:
                    d["fields"] = dict(zip(p.field_names, p.field_regexes))
                for k, dflt in (("normalize", False), ("strip_cjk", False),
                                ("pair_fields", 0),
                                ("layout_parser", "multi_para")):
                    v = getattr(p, k)
                    if v != dflt:
                        d[k] = v
                out.append(d)
        return {"profiles": out}

    @classmethod
    def from_obj(cls, obj: dict) -> "ProfileLibrary":
        lib = cls()
        for d in obj.get("profiles", []):
            fields_map = d.get("fields", {})
            lib.add(Profile(
                doc_class=d["doc_class"],
                profile_id=int(d["profile_id"]),
                keep_selectors=tuple(d.get("keep_selectors", ())),
                field_names=tuple(fields_map.keys()),
                field_regexes=tuple(fields_map.values()),
                normalize=bool(d.get("normalize", False)),
                strip_cjk=bool(d.get("strip_cjk", False)),
                pair_fields=int(d.get("pair_fields", 0)),
                layout_parser=str(d.get("layout_parser", "multi_para")),
            ))
        return lib

    def to_config(self, path: str) -> None:
        """Write the library as JSON (the canonical on-disk form)."""
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self.to_obj(), f, ensure_ascii=False, indent=2)
            f.write("\n")

    @classmethod
    def from_config(cls, path: str) -> "ProfileLibrary":
        """Load a profile library from a JSON or INI file (dispatch on
        extension; anything not ``.ini``/``.cfg``/``.conf`` parses as JSON).

        INI shape mirrors the reference's ``config.ini``: one
        ``[profile:<doc_class>:<profile_id>]`` section per profile, with
        ``field.<name> = <regex>`` entries bound positionally in file
        order, plus plain keys for the toggles::

            [profile:metrics:1]
            keep_selectors = div.metrics-panel
            field.views = ^views (\\d+)$
            field.likes = ^likes (\\d+)$
            normalize = false
        """
        if path.rsplit(".", 1)[-1].lower() in ("ini", "cfg", "conf"):
            return cls._from_ini(path)
        with open(path, encoding="utf-8") as f:
            return cls.from_obj(json.load(f))

    @classmethod
    def _from_ini(cls, path: str) -> "ProfileLibrary":
        import configparser

        cp = configparser.ConfigParser(interpolation=None)
        cp.optionxform = str  # keep case + non-ASCII field names intact
        with open(path, encoding="utf-8") as f:
            cp.read_file(f)
        lib = cls()
        for section in cp.sections():
            if not section.startswith("profile:"):
                continue  # foreign sections ([fields] etc.) are not profiles
            try:
                _, doc_class, pid = section.split(":", 2)
            except ValueError:
                raise ValueError(
                    f"{path}: section [{section}] must be "
                    "[profile:<doc_class>:<profile_id>]") from None
            opts = cp[section]
            names, regexes = [], []
            for k, v in opts.items():  # configparser preserves file order
                if k.startswith("field."):
                    names.append(k[len("field."):])
                    regexes.append(v)
            sel = tuple(s.strip() for s in
                        opts.get("keep_selectors", "").split(",") if s.strip())
            lib.add(Profile(
                doc_class=doc_class,
                profile_id=int(pid),
                keep_selectors=sel,
                field_names=tuple(names),
                field_regexes=tuple(regexes),
                normalize=opts.getboolean("normalize", fallback=False),
                strip_cjk=opts.getboolean("strip_cjk", fallback=False),
                pair_fields=opts.getint("pair_fields", fallback=0),
                layout_parser=opts.get("layout_parser", "multi_para"),
            ))
        if not lib.profiles:
            raise ValueError(f"{path}: no [profile:*] sections found")
        return lib


def load_field_mapping(path: str) -> dict[str, str]:
    """CN→EN column mapping from a config file (reference FIELD_MAPPING,
    db/data_sync.py:15-19): JSON ``{"field_mapping": {...}}`` or INI
    ``[fields]`` section."""
    if path.rsplit(".", 1)[-1].lower() in ("ini", "cfg", "conf"):
        import configparser

        cp = configparser.ConfigParser(interpolation=None)
        cp.optionxform = str
        with open(path, encoding="utf-8") as f:
            cp.read_file(f)
        return dict(cp["fields"]) if cp.has_section("fields") else {}
    with open(path, encoding="utf-8") as f:
        return dict(json.load(f).get("field_mapping", {}))


DEFAULT_PROFILE = Profile(doc_class="default", profile_id=0)


def _parse_selector(sel: str) -> tuple[str, str]:
    if "." in sel:
        tag, cls = sel.split(".", 1)
        return tag, cls
    return sel, ""


def _matches(el: Element, tag: str, cls: str) -> bool:
    if tag and el.tag != tag:
        return False
    # CSS class semantics: token membership, not substring (".ad" must not
    # match class="header").
    if cls and cls not in el.attr("class").split():
        return False
    return True


def apply_span_mask(root: Element, selectors: tuple[str, ...]) -> Element:
    """Keep only subtrees matching any selector (document order) — the
    alpha-mask analog. No selectors → identity. A matched element's
    descendants are not re-collected (each span appears exactly once)."""
    if not selectors:
        return root
    parsed = [_parse_selector(s) for s in selectors]
    keep: list[Element] = []

    def collect(el: Element) -> None:
        if any(_matches(el, t, c) for t, c in parsed):
            keep.append(el)
            return  # don't descend: subtree already kept
        for ch in el.children:
            if isinstance(ch, Element):
                collect(ch)

    collect(root)
    masked = Element("#masked", {}, None)
    masked.children = list(keep)
    return masked


class ExtractionResult:
    __slots__ = ("text", "fields_json", "profile_id", "status")

    def __init__(self, text: str | None, fields_json: str | None,
                 profile_id: int, status: str):
        self.text = text
        self.fields_json = fields_json
        self.profile_id = profile_id
        self.status = status


def extract_with_profiles(html: bytes | str, profiles: list[Profile],
                          compiled: dict[int, list[re.Pattern]] | None = None,
                          ) -> ExtractionResult:
    """The per-document fallback loop: try each profile in order.

    ``compiled`` optionally maps ``id(profile)`` → precompiled field regexes
    (the engine actor precompiles once; standalone calls compile lazily).
    """
    root = parse_html(html)
    for prof in profiles:
        masked = apply_span_mask(root, prof.keep_selectors)
        if prof.keep_selectors:
            source: Element | None = masked
        else:
            source = select_main(masked)
        if source is None:
            continue
        lines: list[str] = []
        _render_container(source, lines)
        if prof.normalize:
            lines = normalize_lines(lines, strip_cjk=prof.strip_cjk)
        if prof.pair_fields:
            # M7 pairing transform: exactly pair_fields label/value lines →
            # one "k:v|k:v" line; mismatch → try the next profile.
            lines = pair_lines(lines, expected=prof.pair_fields)
        if not lines:
            continue
        text = "\n".join(lines) + "\n"
        if prof.field_regexes:
            pats = (compiled or {}).get(id(prof)) or [
                re.compile(rx, re.MULTILINE) for rx in prof.field_regexes
            ]
            values: list[str] = []
            for pat in pats:
                m = pat.search(text)
                if m is None:
                    values = []
                    break
                values.append(m.group(1) if m.groups() else m.group(0))
            if not values:
                continue  # cardinality mismatch → next profile (M8)
            fields_json = json.dumps(
                dict(zip(prof.field_names, values)), ensure_ascii=False, sort_keys=True
            )
        else:
            fields_json = None
        return ExtractionResult(text, fields_json, prof.profile_id, "ok")
    return ExtractionResult(None, None, -1, "failed_all_profiles")


def default_library() -> ProfileLibrary:
    """The flagship's profile library (analog of the shipped mask library +
    config.ini [tags]): metrics-panel pages carry an ordered fallback pair —
    profile 1 declares four fields and fails its cardinality check on
    three-metric pages, forcing the fallback (reference mask loop,
    core/run.py:377-501). All other doc classes use main-content extraction.
    """
    lib = ProfileLibrary()
    lib.add(
        Profile(
            doc_class="metrics",
            profile_id=1,
            keep_selectors=("div.metrics-panel",),
            field_names=("views", "likes", "shares", "comments"),
            field_regexes=(
                r"^views (\d+)$", r"^likes (\d+)$",
                r"^shares (\d+)$", r"^comments (\d+)$",
            ),
        )
    )
    lib.add(
        Profile(
            doc_class="metrics",
            profile_id=2,
            keep_selectors=("div.metrics-panel",),
            field_names=("views", "likes", "shares"),
            field_regexes=(r"^views (\d+)$", r"^likes (\d+)$", r"^shares (\d+)$"),
        )
    )
    return lib
