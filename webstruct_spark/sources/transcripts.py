# -*- coding: utf-8 -*-
"""Deterministic synthetic multi-turn transcript corpus + gazetteer.

Shape per BASELINE.json input_hint:
``(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp)``.  Labeled fixtures carry inline
`` __START_X__ … __END_X__ `` markers in ``text`` — the reference
annotation-loader output format
(/root/reference/webstruct/loaders.py:96-97,142-143).

Design points:

* **Seed-fixed, wall-clock-free.** All randomness from
  ``random.Random(seed)``; timestamps derived from a fixed epoch.
* **Gold mentions are generation metadata**, recorded as entities are
  injected — NOT produced by the extraction kernels — so comparing the
  Spark pipeline output against them is a genuine end-to-end check.
* **Skew knobs** (north rule): mega-conversations (a small fraction of
  conv_ids get ~15x the median turn count) and head entities (Zipfian
  canonical-entity popularity) are on by default.
* Entity surface forms are chosen so that tokenize→smart_join is the
  identity on them (single-space-joined words, no comma/bracket/rule
  triggers), which keeps gold text independent of tokenizer details.

Scale: ``n_conversations = max(3, int(5000 * sf))`` with ~45 turns per
conversation — sf=0.01 ≈ 2.3k turns (driver correctness scale),
sf=0.1 ≈ 23k turns; the bench corpus uses an explicit conversation
count instead of sf.
"""
from __future__ import annotations

import os
import random
import shutil
from dataclasses import dataclass
from datetime import datetime, timedelta
from typing import Dict, List, Optional, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

EPOCH = datetime(2024, 1, 1, 0, 0, 0)

ROLES = ["user", "assistant", "tool", "system"]
TOOLS = ["search", "crm_lookup", "calendar", "mailer", None]

_FIRST = (
    "Ada Alan Grace Edsger Barbara Donald Margaret Dennis Ken Bjarne "
    "Guido Linus John Mary James Linda Robert Susan Michael Karen "
    "David Nancy Richard Betty Charles Helen Joseph Ruth Thomas Alice "
    "Frank Diana Walter Clara Henry Rosa Peter Irene Samuel Vera"
).split()
_LAST = (
    "Lovelace Turing Hopper Dijkstra Liskov Knuth Hamilton Ritchie "
    "Thompson Stroustrup Rossum Torvald Marsh Quill Hale Frost Reyes "
    "Nakamura Okafor Lindgren Fournier Castellanos Petrov Haugen "
    "Moreau Tanaka Osei Varga Novak Eriksen Duarte Keller Brandt "
    "Soto Vance Ingram Marek Thorne Abara Whitfield"
).split()
_ORG_STEM = (
    "Acme Globex Initech Umbrella Stark Wayne Cyberdyne Tyrell Aperture "
    "Vandelay Wonka Sterling Dunder Hooli Pied Massive Soylent Oscorp "
    "Gringott Duff Paper Octan Zorg Virtucon Monarch Ewing Nakatomi "
    "Clamp Genco Benthic Lumon Prodigy Vehement Northwind Contoso "
    "Fabrikam Adventure Tailspin Wingtip Alpine Meridian"
).split()
_ORG_SUFFIX = "Systems Labs Corp Inc Ltd Group Industries Analytics Dynamics Holdings".split()
_CITY = (
    "Dallas Austin Boston Denver Seattle Portland Atlanta Chicago "
    "Phoenix Tucson Omaha Boise Raleigh Memphis Nashville Tulsa "
    "Fresno Oakland Anaheim Tampa Orlando Reno Spokane Lubbock "
    "Plano Laredo Gilbert Norfolk Durham Madison Lincoln Buffalo "
    "Glendale Chandler Scottsdale Fremont Irving Hialeah Garland Akron"
).split()
_CITY2 = ["North {}", "East {}", "West {}", "South {}", "New {}", "{} Heights", "{} Springs"]
_COUNTRY = (
    "Andorra Belgium Canada Denmark Estonia Finland Georgia Hungary "
    "Iceland Jamaica Kenya Latvia Morocco Norway Oman Portugal Qatar "
    "Rwanda Senegal Tunisia Uruguay Vanuatu Zambia Austria Brazil "
    "Chile Ecuador Fiji Ghana"
).split()
_STATE = "TX CA NY WA OR GA IL AZ NE ID NC TN OK OH FL NV MN WI CO UT".split()
_STREET_NAME = (
    "Lovers Oak Maple Cedar Elm Walnut Pine Birch Willow Laurel "
    "Magnolia Juniper Hickory Sycamore Poplar Chestnut Spruce Alder "
    "Hawthorn Linden"
).split()
_STREET_TYPE = "Lane Road Street Avenue Boulevard Drive Court Place Parkway Circle".split()
_FILLER = (
    "please check the latest status update for our project and let me "
    "know when you can review it thanks I think we should schedule a "
    "quick sync about next steps also the report looks good overall "
    "but needs more detail on timeline budget risks owners follow up "
    "with them tomorrow morning regarding shipment invoice contract "
    "renewal meeting notes agenda summary action items deadline"
).split()

MARKER_TYPES = [
    "ORG", "PER", "CITY", "STATE", "ZIPCODE", "COUNTRY",
    "STREET", "TEL", "FAX", "EMAIL",
]


@dataclass
class GazEntry:
    alias: str
    canonical_id: str
    entity_type: str
    weight: float


def build_gazetteer(seed: int = 42) -> List[GazEntry]:
    """Synthetic alias dictionary with Zipfian head-entity weights.

    Modeled on the reference countries gazetteer / GeoNames record
    shape (/root/reference/webstruct/gazetteers/geonames.py:13-29).
    """
    rng = random.Random(seed * 7919 + 1)
    entries: List[GazEntry] = []
    seen = set()

    def add(alias: str, cid: str, etype: str, rank: int) -> None:
        if alias in seen:
            return
        seen.add(alias)
        entries.append(GazEntry(alias, cid, etype, 1.0 / (1 + rank)))

    rank = 0
    for i, stem in enumerate(_ORG_STEM):
        suffix = _ORG_SUFFIX[i % len(_ORG_SUFFIX)]
        cid = "ORG:%04d" % i
        add("%s %s" % (stem, suffix), cid, "ORG", rank)
        add(stem, cid, "ORG", rank)  # short alias of the same org
        rank += 1
    for i in range(100):
        cid = "PER:%04d" % i
        first = _FIRST[rng.randrange(len(_FIRST))]
        last = _LAST[rng.randrange(len(_LAST))]
        add("%s %s" % (first, last), cid, "PER", rank)
        rank += 1
    cities = list(_CITY)
    for pat in _CITY2:
        cities.extend(pat.format(c) for c in _CITY[:10])
    for i, c in enumerate(cities):
        add(c, "CITY:%04d" % i, "CITY", rank)
        rank += 1
    for i, c in enumerate(_COUNTRY):
        add(c, "COUNTRY:%04d" % i, "COUNTRY", rank)
        rank += 1
    for i, s in enumerate(_STATE):
        add(s, "STATE:%04d" % i, "STATE", rank)
        rank += 1
    return entries


class _EntityPicker:
    """Zipfian picker over gazetteer canonical ids (head-entity skew)."""

    def __init__(self, entries: List[GazEntry], rng: random.Random):
        self.rng = rng
        self.by_type: Dict[str, List[GazEntry]] = {}
        for e in entries:
            self.by_type.setdefault(e.entity_type, []).append(e)
        # cumulative Zipf weights per type
        self._cum: Dict[str, List[float]] = {}
        for t, lst in self.by_type.items():
            tot, cum = 0.0, []
            for i in range(len(lst)):
                tot += 1.0 / (1 + i)
                cum.append(tot)
            self._cum[t] = cum

    def pick(self, etype: str) -> GazEntry:
        lst, cum = self.by_type[etype], self._cum[etype]
        x = self.rng.random() * cum[-1]
        lo, hi = 0, len(cum) - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if cum[mid] < x:
                lo = mid + 1
            else:
                hi = mid
        return lst[lo]


def _tel(rng: random.Random) -> str:
    return "%d-%03d-%04d" % (rng.randint(200, 989), rng.randint(100, 999), rng.randint(0, 9999))


def _zipcode(rng: random.Random) -> str:
    return "%05d" % rng.randint(10000, 99999)


def _street(rng: random.Random) -> str:
    return "%d %s %s" % (
        rng.randint(100, 9999),
        _STREET_NAME[rng.randrange(len(_STREET_NAME))],
        _STREET_TYPE[rng.randrange(len(_STREET_TYPE))],
    )


def _email(rng: random.Random) -> str:
    u = _FIRST[rng.randrange(len(_FIRST))].lower()
    d = _ORG_STEM[rng.randrange(len(_ORG_STEM))].lower()
    return "%s@%s.com" % (u, d)


def _filler(rng: random.Random, n: int) -> List[str]:
    return [_FILLER[rng.randrange(len(_FILLER))] for _ in range(n)]


def generate_corpus(
    n_conversations: int,
    seed: int = 42,
    mega_every: int = 37,
    mega_factor: int = 15,
) -> Tuple[List[dict], List[dict], List[GazEntry]]:
    """Generate (transcript_rows, gold_mention_rows, gazetteer).

    Gold mentions record exactly what was injected:
    (conv_id, turn_idx, mention_idx, text, entity_type).
    """
    rng = random.Random(seed)
    gaz = build_gazetteer(seed)
    picker = _EntityPicker(gaz, rng)

    turns: List[dict] = []
    gold: List[dict] = []

    for ci in range(n_conversations):
        conv_id = "conv-%06d" % ci
        n_turns = rng.randint(20, 60)
        if mega_every and ci % mega_every == 0:
            n_turns *= mega_factor  # mega-conversation skew knob
        ts = EPOCH + timedelta(hours=ci % 1000)
        for ti in range(n_turns):
            role = ROLES[rng.randrange(4)] if rng.random() < 0.9 else "user"
            tool = TOOLS[rng.randrange(4)] if role == "tool" else None
            parts: List[str] = []
            mention_idx = 0
            r = rng.random()

            def inject(etype: str, surface: str) -> None:
                nonlocal mention_idx
                parts.append("__START_%s__" % etype)
                parts.append(surface)
                parts.append("__END_%s__" % etype)
                gold.append(
                    dict(
                        conv_id=conv_id,
                        turn_idx=ti,
                        mention_idx=mention_idx,
                        text=surface,
                        entity_type=etype,
                    )
                )
                mention_idx += 1

            parts.extend(_filler(rng, rng.randint(2, 8)))
            if r < 0.25:
                pass  # no entities this turn
            elif r < 0.60:
                # scattered mentions
                for _ in range(rng.randint(1, 3)):
                    etype = ("ORG", "PER", "CITY", "COUNTRY")[rng.randrange(4)]
                    inject(etype, picker.pick(etype).alias)
                    parts.extend(_filler(rng, rng.randint(1, 6)))
            else:
                # a contact "record": fields in close sequence
                org = picker.pick("ORG")
                inject("ORG", org.alias)
                parts.extend(_filler(rng, rng.randint(0, 2)))
                inject("STREET", _street(rng))
                inject("CITY", picker.pick("CITY").alias)
                inject("STATE", picker.pick("STATE").alias)
                inject("ZIPCODE", _zipcode(rng))
                if rng.random() < 0.8:
                    parts.append("Phone:")
                    inject("TEL", _tel(rng))
                if rng.random() < 0.5:
                    parts.append("Fax:")
                    inject("FAX", _tel(rng))
                if rng.random() < 0.4:
                    parts.append("Email:")
                    inject("EMAIL", _email(rng))
            parts.extend(_filler(rng, rng.randint(1, 4)))

            turns.append(
                dict(
                    conv_id=conv_id,
                    turn_idx=ti,
                    role=role,
                    text=" ".join(parts),
                    tool=tool,
                    ts=ts + timedelta(seconds=13 * ti),
                )
            )
    return turns, gold, gaz


# ---------------------------------------------------------------------------
# parquet materialization + cache

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

GOLD_MENTION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("mention_idx", pa.int32()),
        ("text", pa.string()),
        ("entity_type", pa.string()),
    ]
)

GAZETTEER_SCHEMA = pa.schema(
    [
        ("alias", pa.string()),
        ("canonical_id", pa.string()),
        ("entity_type", pa.string()),
        ("weight", pa.float64()),
    ]
)


def _rows_to_table(rows: List[dict], schema: pa.Schema) -> pa.Table:
    cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
    return pa.Table.from_pydict(cols, schema=schema)


def n_conversations_for_sf(sf: float) -> int:
    return max(3, int(5000 * sf))


def default_corpus_dir(name: str) -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "data", "transcripts", name)


def materialize_corpus(
    out_dir: str,
    n_conversations: int,
    seed: int = 42,
    force: bool = False,
) -> str:
    """Write transcripts/gazetteer/gold_mentions parquet to ``out_dir``
    (atomically: temp dir + rename). Idempotent unless ``force``."""
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done) and not force:
        return out_dir
    turns, gold, gaz = generate_corpus(n_conversations, seed=seed)
    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(_rows_to_table(turns, TRANSCRIPT_SCHEMA),
                   os.path.join(tmp, "transcripts.parquet"))
    pq.write_table(_rows_to_table(gold, GOLD_MENTION_SCHEMA),
                   os.path.join(tmp, "gold_mentions.parquet"))
    gaz_rows = [e.__dict__ for e in gaz]
    pq.write_table(_rows_to_table(gaz_rows, GAZETTEER_SCHEMA),
                   os.path.join(tmp, "gazetteer.parquet"))
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write("n_conversations=%d seed=%d\n" % (n_conversations, seed))
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.rename(tmp, out_dir)
    return out_dir


def ensure_corpus_for_sf(sf: float, seed: int = 42) -> str:
    """Generate-if-missing the corpus matching a testdata scale factor;
    returns its directory."""
    name = ("sf%g" % sf)
    return materialize_corpus(
        default_corpus_dir(name), n_conversations_for_sf(sf), seed=seed
    )
