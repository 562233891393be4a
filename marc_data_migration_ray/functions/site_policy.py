"""Vectorized site-policy kernels (reference P1-P5, P7, P9-P11).

The reference's pnca plugin mutates records row-at-a-time
(``processors/plugins/pnca/pnca_policy.py``); here each mutator is a pure
Arrow batch kernel over string columns:

- location mapping (P1/P2): the 35-entry prefix→code dict + ordered regex
  keyer of ``location_mapper.py:9-108`` recast as ``np.select`` over RE2
  prefix matches (the broadcast small-side lookup — the map is baked into
  the kernel, shipped once per actor, never per batch);
- inventory / funds / item-policy note parsing (P3/P4/P5,
  ``pnca_policy.py:281-313,482-499``): pipe-delimited note items parsed
  with anchored ``pyarrow.compute`` regex extraction;
- dup-100 merge (P7, ``pnca_policy.py:98-116``);
- mat-type consistency audit (P11, ``pnca_policy.py:131-172``);
- online-type classification (M10/P12, ``pnca_policy.py:71-96``).

Every regex is RE2-compatible and mirrored verbatim in the DuckDB oracle
SQL (``__ray_entry__.oracle_sql``), so Ray and oracle compute identical
results.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: literal 852$b locations mapped directly (reference pnca_policy.py:340,
#: location_mapper.py:52-53).
LITERAL_LOCATIONS = {
    "1st Floor CDs": "pcds",
    "OVERSIZE PERIODICALS": "pmezzover",
}

#: ordered (regex, code) keyer rules — reference location_mapper.get_key
#: (location_mapper.py:66-108) composed with the mapping dict
#: (location_mapper.py:9-54). ORDER IS SEMANTICS: '^spec over' before
#: '^over' before '^spec'; '^new' before the 'ne' family.
LOCATION_RULES = (
    (r"^spec over", "poverspec"),
    (r"^over", "pover"),
    (r"^periodical", "pperiod"),
    (r"^thesis", "ptheses"),
    (r"^games", "pmezzgame"),
    (r"^archive", "parchives"),
    (r"^spec", "pspecial"),
    (r"^dvd", "pmezzdvd"),
    (r"^zine", "pzine"),
    (r"^new", "pnew"),
    (r"^asc", "pasc"),
    (r"^video", "pvhs"),
    (r"^perm", "presperm"),
    (r"^(circ|headphone|usb|thumb|tv remote|elevator|scissors)", "pcirc"),
    (r"^(na|nb|nc|nd)", "pstacks"),
    (r"^(ne|nk|nx)", "pmezzstack"),
    # first-character fallback (mapping has no i/o/w/x/y: those get no code)
    (r"^[abcdefghjklmn]", "pstacks"),
    (r"^[pqrstuvz]", "pmezzstack"),
)

#: pipe-delimited note-item patterns (reference splits 852$1 on '|' and
#: re.match()es each item; ``(?:^|\|)`` anchors an item start instead).
#: named groups (pc.extract_regex requires them); RE2 numbers named groups
#: too, so DuckDB's regexp_extract(text, pattern, N) shares these verbatim.
INVENTORY_RE = r"(?:^|\|)Inventory:(?P<mm>\d{2})/(?P<dd>\d{2})/(?P<yyyy>\d{4,5})"
FUND_RE = r"(?:^|\|)(?P<item>Fund[^|]*)"
POLICY_RE = r"(?:^|\|)Policy:LIB"
SHELF_RE = r"(?:^|\|)Shelf:(?P<cn>[^|]+)"
LOC_RE = r"(?:^|\|)Loc:(?P<loc>[^|]+)"

#: online markers in reference precedence (pnca_policy.py:87-95: first
#: match wins per record).
ONLINE_MARKERS = (
    ("STREAMING VIDEO", "streaming video"),
    ("EBOOK", "ebook"),
    ("ONLINE PERIODICAL", "online periodical"),
)

#: mat-type audit rules (reference analyze_type, pnca_policy.py:144-172):
#: (name, call-number trigger, 300$a exoneration, extra call-number veto).
MAT_TYPE_RULES = (
    # "audio" in 300a, call number is not cd/cdrom/cd-rom
    ("audio", None, ("audio",), ("cdrom", "cd-rom"), r"^cd\s"),
    ("video", ("video",), ("videocassette", "videorecording"), (), None),
    ("dvd", ("dvd",), ("videodisc", "dvd"), (), None),
    ("cdrom", ("cdrom",), ("cd-rom", "cdrom", "optical"), (), None),
    ("cd-rom", ("cd-rom",), ("cd-rom", "cdrom", "optical"), (), None),
)


def _str(col) -> pa.Array:
    a = pc.cast(col, pa.string())
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    return a


def location_for_callnumber(call_numbers) -> pa.Array:
    """P1/P2: call-number prefix → location code (null when unmapped/null)."""
    s = pc.utf8_lower(_str(call_numbers))
    n = len(s)
    conds = [
        pc.fill_null(pc.match_substring_regex(s, rx), False).to_numpy(zero_copy_only=False)
        for rx, _ in LOCATION_RULES
    ]
    codes = [code for _, code in LOCATION_RULES]
    out = np.select(conds, codes, default=None)
    valid = pc.is_valid(s).to_numpy(zero_copy_only=False)
    out[~valid] = None
    return pa.array(out, pa.string())


def literal_location(values) -> pa.Array:
    """Literal 852$b → code for the two special shelving locations."""
    s = _str(values)
    out = pa.nulls(len(s), pa.string())
    for lit, code in LITERAL_LOCATIONS.items():
        out = pc.if_else(pc.equal(s, lit), pa.scalar(code, pa.string()), out)
    return out if isinstance(out, pa.Array) else out.combine_chunks()


def _extract_group(notes, pattern: str, group: int) -> pa.Array:
    """First regex capture group ``group`` per row, null when unmatched."""
    st = pc.extract_regex(_str(notes), pattern)
    if isinstance(st, pa.ChunkedArray):
        st = st.combine_chunks()
    # struct children do not inherit parent nulls: mask explicitly
    return pc.if_else(pc.is_valid(st), st.field(group - 1), pa.scalar(None, pa.string()))


def inventory_dates(notes) -> pa.Array:
    """P3: ``Inventory:MM/DD/YYYY`` note item → ``YYYYMMDD`` string."""
    st = pc.extract_regex(_str(notes), INVENTORY_RE)
    if isinstance(st, pa.ChunkedArray):
        st = st.combine_chunks()
    mm, dd, yyyy = st.field(0), st.field(1), st.field(2)
    joined = pc.binary_join_element_wise(yyyy, mm, dd, "")
    return pc.if_else(pc.is_valid(st), joined, pa.scalar(None, pa.string()))


def funds(notes) -> pa.Array:
    """P4: ``Fund...`` note item → ``'PNCA ' + item``."""
    item = _extract_group(notes, FUND_RE, 1)
    prefixed = pc.binary_join_element_wise(
        pa.scalar("PNCA ", pa.string()), item, pa.scalar("", pa.string())
    )
    return pc.if_else(pc.is_valid(item), prefixed, pa.scalar(None, pa.string()))


def item_policies(notes) -> pa.Array:
    """P5: ``Policy:LIB...`` note item → constant ``'PNOCIRC'``."""
    hit = pc.fill_null(pc.match_substring_regex(_str(notes), POLICY_RE), False)
    return pc.if_else(hit, pa.scalar("PNOCIRC", pa.string()), pa.scalar(None, pa.string()))


def shelf_call_numbers(notes) -> pa.Array:
    """``Shelf:<call number>`` note item → call number string."""
    return _extract_group(notes, SHELF_RE, 1)


def loc_literals(notes) -> pa.Array:
    """``Loc:<literal>`` note item → raw literal location string."""
    return _extract_group(notes, LOC_RE, 1)


def online_types(notes) -> pa.Array:
    """M10/P12: classify online records by marker substring, reference
    precedence (streaming > ebook > periodical); null = offline."""
    s = _str(notes)
    n = len(s)
    conds = [
        pc.fill_null(pc.match_substring(s, marker), False).to_numpy(zero_copy_only=False)
        for marker, _ in ONLINE_MARKERS
    ]
    out = np.select(conds, [label for _, label in ONLINE_MARKERS], default=None)
    return pa.array(out, pa.string())


def fix_dup_100(author, uniform_lang) -> tuple[pa.Array, pa.Array]:
    """P7 (reference __fix_duplicate_100_field): when both the main-entry
    column and the uniform-title language column are present, merge the
    language into the main entry (unless it already carries one, detected by
    a `` · lang=`` marker) and drop the uniform-title value.

    Returns (merged_author, remaining_uniform_lang).
    """
    a = _str(author)
    l = _str(uniform_lang)
    both = pc.and_kleene(pc.is_valid(a), pc.is_valid(l))
    both = pc.fill_null(both, False)
    has_lang = pc.fill_null(pc.match_substring(a, " · lang="), False)
    merged = pc.if_else(
        pc.and_(both, pc.invert(has_lang)),
        pc.binary_join_element_wise(a, pc.fill_null(l, ""), " · lang="),
        a,
    )
    remaining = pc.if_else(both, pa.scalar(None, pa.string()), l)
    return merged, remaining


def mat_type_conflicts(call_numbers, phys_descs) -> dict[str, pa.Array]:
    """P11 (reference analyze_type): boolean conflict column per rule.

    A row participates only when BOTH the call number and the physical
    description are present (reference pnca_policy.py:144)."""
    cn = pc.utf8_lower(_str(call_numbers))
    pd_ = pc.utf8_lower(_str(phys_descs))
    present = pc.fill_null(pc.and_(pc.is_valid(cn), pc.is_valid(pd_)), False)

    def has(col, sub):
        return pc.fill_null(pc.match_substring(col, sub), False)

    out: dict[str, pa.Array] = {}
    for name, cn_trig, exonerate, cn_veto, cn_veto_re in MAT_TYPE_RULES:
        if cn_trig is None:  # audio rule triggers on the 300$a side
            trig = has(pd_, "audio")
        else:
            trig = has(cn, cn_trig[0])
            ex = has(pd_, exonerate[0])
            for e in exonerate[1:]:
                ex = pc.or_(ex, has(pd_, e))
            trig = pc.and_(trig, pc.invert(ex))
        if cn_trig is None:
            for v in cn_veto:
                trig = pc.and_(trig, pc.invert(has(cn, v)))
            if cn_veto_re:
                trig = pc.and_(
                    trig, pc.invert(pc.fill_null(pc.match_substring_regex(cn, cn_veto_re), False))
                )
        out[name] = pc.and_(present, trig)
    return out
