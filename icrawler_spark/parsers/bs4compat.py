"""BeautifulSoup-compatible facade over the stdlib DOM in ``dom.py``.

Covers exactly the bs4 API surface the reference parsers consume
(ref parser.py:95-601, parser_tiaofasi.py:28-245): ``BeautifulSoup(html,
"html.parser")``, ``Tag`` with ``.name`` / ``.parent`` / ``.children`` /
``.previous_sibling`` / ``.previous_siblings`` / ``.get`` / ``.get_text`` /
``.find`` / ``.find_all`` / ``.find_parent``, and ``NavigableString`` (a
``str`` subclass). Multi-valued attributes (``class``, ``rel``, …) come back
as token lists, matching bs4's cdata-list behavior that
``_looks_like_pagination_label`` (ref parser.py:543-551) relies on.

Purpose: let the REFERENCE parser modules execute in-process on the same
HTML our Arrow parse UDFs see, so parity tests compare entry-for-entry
parser outputs instead of hand-ported golden fixtures. The engine's own hot
path never imports this module — ``parsers/listing.py`` runs directly on
``dom.py``.

Wrapper identity is cached per underlying element so the reference's
``child is current`` walks (ref parser.py:104-106) behave exactly as with
real bs4 objects.
"""

from __future__ import annotations

from .dom import Element, TextNode, parse_html

# bs4's cdata-list attributes for HTML (the two the reference reads are
# class and rel; the rest included for fidelity)
_MULTI_VALUED = frozenset({"class", "rel", "rev", "accept-charset", "headers", "accesskey"})


class NavigableString(str):
    """Text node: a plain ``str`` (bs4's NavigableString subclasses str)."""

    def __new__(cls, data: str, parent: "Tag | None" = None):
        self = super().__new__(cls, data)
        self.parent = parent
        return self


class Tag:
    """Wrapper over a ``dom.Element`` exposing the bs4 Tag API."""

    def __init__(self, el: Element, registry: dict):
        self._el = el
        self._registry = registry

    # -- identity-stable wrapping ---------------------------------------------

    @classmethod
    def _for(cls, el: Element, registry: dict) -> "Tag":
        t = registry.get(id(el))
        if t is None:
            t = Tag(el, registry)
            registry[id(el)] = t
        return t

    def _wrap(self, node):
        if isinstance(node, TextNode):
            parent = Tag._for(node.parent, self._registry) if node.parent is not None else None
            return NavigableString(node.data, parent)
        return Tag._for(node, self._registry)

    # -- structure ------------------------------------------------------------

    @property
    def name(self) -> str:
        return self._el.name

    @property
    def parent(self) -> "Tag | None":
        p = self._el.parent
        return Tag._for(p, self._registry) if p is not None else None

    @property
    def children(self):
        return iter([self._wrap(c) for c in self._el.children])

    @property
    def contents(self):
        return [self._wrap(c) for c in self._el.children]

    @property
    def previous_sibling(self):
        parent = self._el.parent
        if parent is None:
            return None
        idx = parent.children.index(self._el)
        return self._wrap(parent.children[idx - 1]) if idx > 0 else None

    @property
    def previous_siblings(self):
        parent = self._el.parent
        if parent is None:
            return
        idx = parent.children.index(self._el)
        for node in reversed(parent.children[:idx]):
            yield self._wrap(node)

    @property
    def next_sibling(self):
        parent = self._el.parent
        if parent is None:
            return None
        idx = parent.children.index(self._el)
        if idx + 1 < len(parent.children):
            return self._wrap(parent.children[idx + 1])
        return None

    # -- attributes -----------------------------------------------------------

    @property
    def attrs(self) -> dict:
        return {k: self.get(k) for k in self._el.attrs}

    def get(self, key: str, default=None):
        v = self._el.attrs.get(key)
        if v is None:
            return default
        if key in _MULTI_VALUED:
            return v.split()
        return v

    def has_attr(self, key: str) -> bool:
        return key in self._el.attrs

    def __getitem__(self, key: str):
        v = self.get(key)
        if v is None and key not in self._el.attrs:
            raise KeyError(key)
        return v

    # -- text -----------------------------------------------------------------

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        return self._el.get_text(separator, strip=strip)

    @property
    def text(self) -> str:
        return self.get_text()

    # -- search ---------------------------------------------------------------

    def _matches(self, el: Element, name, class_, attr_filters) -> bool:
        if name is not None:
            names = (name,) if isinstance(name, str) else tuple(name)
            if el.name not in names:
                return False
        if class_ is not None:
            tokens = (el.attrs.get("class") or "").split()
            if class_ is True:
                if not tokens:
                    return False
            elif class_ not in tokens:
                return False
        for key, want in attr_filters.items():
            if want is True:
                if key not in el.attrs:
                    return False
            elif want is False:
                if key in el.attrs:
                    return False
            else:
                have = el.attrs.get(key)
                if have is None:
                    return False
                if key in _MULTI_VALUED:
                    if want not in have.split():
                        return False
                elif have != want:
                    return False
        return True

    def find_all(self, name=None, attrs=None, recursive: bool = True, limit=None, **kwargs):
        class_ = kwargs.pop("class_", None)
        attr_filters = dict(attrs or {})
        attr_filters.update(kwargs)
        if "class" in attr_filters:
            class_ = attr_filters.pop("class")
        pool = self._el.iter_descendants() if recursive else iter(self._el.children)
        out = []
        for node in pool:
            if isinstance(node, Element) and self._matches(node, name, class_, attr_filters):
                out.append(Tag._for(node, self._registry))
                if limit is not None and len(out) >= limit:
                    break
        return out

    def find(self, name=None, attrs=None, recursive: bool = True, **kwargs):
        found = self.find_all(name, attrs, recursive=recursive, limit=1, **kwargs)
        return found[0] if found else None

    def find_parent(self, name=None):
        names = None
        if name is not None:
            names = (name,) if isinstance(name, str) else tuple(name)
        cur = self._el.parent
        while cur is not None:
            if names is None or cur.name in names:
                return Tag._for(cur, self._registry)
            cur = cur.parent
        return None

    def __repr__(self) -> str:
        return f"<Tag {self._el.name}>"


class BeautifulSoup(Tag):
    """Root document node — a Tag named ``[document]``, like real bs4."""

    def __init__(self, markup: str = "", features: str | None = None, **kwargs):
        if isinstance(markup, (bytes, bytearray)):
            markup = markup.decode("utf-8", "replace")
        registry: dict = {}
        root = parse_html(markup or "")
        super().__init__(root, registry)
        registry[id(root)] = self
