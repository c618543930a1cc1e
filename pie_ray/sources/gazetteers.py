"""Seeded gazetteers for the deterministic synthetic web corpus (FIXTURES.md §2)
and for the NER tagger's lexicon channel.

Everything here is a pure function of (SEED, index): person pool, alias
variants, emails, phones, addresses, IDs, url domains (Zipf-skewed to
exercise salted repartitioning), filler vocabulary. The NER model builds its
vocab from the same lists — that is by design: the reference system's NER was
fixture-driven too, and the e2e P/R gate (BASELINE.json) is measured on this
corpus, where ground truth is known by construction.
"""

from __future__ import annotations

import bisect
from functools import lru_cache

from pie_ray.util import stable_hash64

SEED = 42
N_PERSONS = 500
N_DOMAINS = 1000
N_EMAIL_DOMAINS = 40
ZIPF_S = 1.2

FIRST_NAMES = [
    "james", "mary", "robert", "patricia", "john", "jennifer", "michael",
    "linda", "david", "elizabeth", "william", "barbara", "richard", "susan",
    "joseph", "jessica", "thomas", "karen", "charles", "sarah", "christopher",
    "lisa", "daniel", "nancy", "matthew", "sandra", "anthony", "betty",
    "mark", "ashley", "donald", "emily", "steven", "kimberly", "andrew",
    "margaret", "paul", "donna", "joshua", "michelle", "kenneth", "carol",
    "kevin", "amanda", "brian", "melissa", "timothy", "deborah", "ronald",
    "stephanie", "george", "rebecca", "jason", "sharon", "edward", "laura",
    "jeffrey", "cynthia", "ryan", "dorothy", "jacob", "amy", "nicholas",
    "kathleen", "gary", "angela", "eric", "shirley", "jonathan", "brenda",
    "stephen", "emma", "larry", "anna", "justin", "pamela", "scott",
    "nicole", "brandon", "samantha", "benjamin", "katherine", "samuel",
    "christine", "gregory", "helen", "alexander", "debra", "patrick",
    "rachel", "frank", "carolyn", "raymond", "janet", "jack", "maria",
    "dennis", "olivia", "jerry", "heather",
]

LAST_NAMES = [
    "anderson", "ashworth", "baldwin", "barrington", "bennett", "blackwood",
    "boswell", "bradford", "brennan", "brockman", "calloway", "carmichael",
    "castellano", "chamberlain", "chandler", "churchill", "clearwater",
    "colebrook", "covington", "cresswell", "dalrymple", "davenport",
    "delacroix", "dunmore", "eastwood", "ellington", "emerson", "fairbanks",
    "fenwick", "fitzgerald", "fletcher", "galbraith", "garfield", "gillespie",
    "goldsmith", "granville", "greenfield", "grimshaw", "halloway",
    "hargreaves", "harrington", "hathaway", "hawthorne", "henderson",
    "hollingsworth", "holloway", "humphries", "huxley", "inglewood",
    "ironside", "jamison", "jefferson", "kensington", "kingsley", "kirkland",
    "lancaster", "langford", "lindqvist", "littlewood", "lockhart",
    "macallister", "mansfield", "marlowe", "mcallister", "merriweather",
    "middleton", "montgomery", "mortimer", "nightingale", "northcott",
    "oakley", "ogilvie", "paddington", "pemberton", "pennington",
    "prescott", "quimby", "radcliffe", "ravenswood", "redfern", "remington",
    "rockwell", "rutherford", "sanderson", "seabrook", "sheffield",
    "sinclair", "somerville", "stanfield", "stirling", "sutherland",
    "thackeray", "thornbury", "underwood", "vanderbilt", "wainwright",
    "wakefield", "westbrook", "whitfield", "wickham", "winterbourne",
    "woodhouse", "wycliffe", "yardley", "zimmerman",
]

STREET_NAMES = [
    "Maple", "Oak", "Cedar", "Birch", "Willow", "Aspen", "Juniper", "Alder",
    "Hawthorn", "Magnolia", "Sycamore", "Chestnut", "Poplar", "Linden",
    "Spruce", "Walnut", "Hazel", "Rowan", "Laurel", "Cypress",
]
STREET_TYPES = ["Street", "Avenue", "Road", "Lane", "Drive", "Boulevard"]
CITIES = [
    "Springfield", "Riverton", "Lakewood", "Fairview", "Georgetown",
    "Clinton", "Salem", "Madison", "Ashland", "Burlington", "Dayton",
    "Franklin", "Greenville", "Kingston", "Milton", "Newport", "Oxford",
    "Princeton", "Quincy", "Richmond",
]

DOMAIN_WORDS = [
    "acme", "globex", "initech", "umbrella", "stark", "wayne", "wonka",
    "tyrell", "cyberdyne", "nakatomi", "oscorp", "dunder", "hooli",
    "piedpiper", "vehement", "massive", "dynamic", "vandelay", "prestige",
    "paradigm",
]
TLDS = ["com", "org", "net", "io", "co"]

FILLER_WORDS = (
    "the quick data pipeline processes records daily while batch jobs stream "
    "through distributed workers and columnar storage keeps throughput high "
    "because vectorized kernels scan parquet blocks with minimal overhead "
    "under backpressure from the streaming executor which schedules tasks "
    "across nodes moving shuffled partitions into object store memory"
).split()

NONEN_WORDS = (
    "el proceso de datos rapido fluye por los nodos mientras las tareas "
    "distribuidas leen bloques columnares y escriben resultados agrupados "
    "cada dia sin demora entre las particiones del sistema"
).split()


def _pick(lst, key: str) -> str:
    return lst[stable_hash64(key) % len(lst)]


@lru_cache(maxsize=1)
def person_pool() -> list[dict]:
    """500 seeded persons, each with deterministic alias surface variants and
    attached PII attributes. Alias variants share char-3-gram overlap so the
    exact-Jaccard linking rule (and its MinHash-LSH approximation) groups
    them (SURVEY.md A10–A12)."""
    persons = []
    for i in range(N_PERSONS):
        first = _pick(FIRST_NAMES, f"{SEED}|first|{i}")
        last = _pick(LAST_NAMES, f"{SEED}|last|{i}")
        fc, lc = first.capitalize(), last.capitalize()
        mid = chr(ord("A") + stable_hash64(f"{SEED}|mid|{i}") % 26)
        aliases = [
            f"{fc} {lc}",
            f"{fc} {mid}. {lc}",
            f"{fc[0]}. {lc}",
            f"{lc}, {fc}",
        ]
        edom = (
            f"{_pick(DOMAIN_WORDS, f'{SEED}|ed|{i}')}mail"
            f"{stable_hash64(f'{SEED}|edn|{i}') % N_EMAIL_DOMAINS}.com"
        )
        email = f"{first}.{last}@{edom}"
        area = 200 + stable_hash64(f"{SEED}|pa|{i}") % 800
        mid3 = 200 + stable_hash64(f"{SEED}|pm|{i}") % 800
        last4 = stable_hash64(f"{SEED}|pl|{i}") % 10000
        phone_digits = f"{area}{mid3}{last4:04d}"
        phones = [
            f"({area}) {mid3}-{last4:04d}",
            f"{area}-{mid3}-{last4:04d}",
            f"+1 {area} {mid3} {last4:04d}",
        ]
        addr = (
            f"{1 + stable_hash64(f'{SEED}|an|{i}') % 9899} "
            f"{_pick(STREET_NAMES, f'{SEED}|as|{i}')} "
            f"{_pick(STREET_TYPES, f'{SEED}|at|{i}')}, "
            f"{_pick(CITIES, f'{SEED}|ac|{i}')}"
        )
        if stable_hash64(f"{SEED}|idk|{i}") % 2 == 0:
            pid = (
                f"{100 + stable_hash64(f'{SEED}|id1|{i}') % 900:03d}-"
                f"{10 + stable_hash64(f'{SEED}|id2|{i}') % 90:02d}-"
                f"{1000 + stable_hash64(f'{SEED}|id3|{i}') % 9000:04d}"
            )
        else:
            l1 = chr(ord("A") + stable_hash64(f"{SEED}|id4|{i}") % 26)
            l2 = chr(ord("A") + stable_hash64(f"{SEED}|id5|{i}") % 26)
            pid = f"{l1}{l2}{1000000 + stable_hash64(f'{SEED}|id6|{i}') % 9000000}"
        persons.append(
            {
                "aliases": aliases,
                "email": email,
                "phones": phones,
                "phone_digits": phone_digits,
                "addr": addr,
                "id": pid,
            }
        )
    return persons


@lru_cache(maxsize=1)
def url_domains() -> list[str]:
    return [
        f"{_pick(DOMAIN_WORDS, f'{SEED}|dw|{i}')}{i}."
        f"{_pick(TLDS, f'{SEED}|dt|{i}')}"
        for i in range(N_DOMAINS)
    ]


@lru_cache(maxsize=1)
def _zipf_cum() -> list[float]:
    w = [1.0 / (i + 1) ** ZIPF_S for i in range(N_DOMAINS)]
    tot = sum(w)
    cum, acc = [], 0.0
    for x in w:
        acc += x / tot
        cum.append(acc)
    return cum


def zipf_domain(u: float) -> str:
    """Map a uniform [0,1) draw to a Zipf(s=1.2)-distributed domain."""
    return url_domains()[bisect.bisect_left(_zipf_cum(), u)]


@lru_cache(maxsize=1)
def name_token_sets() -> tuple[frozenset[str], frozenset[str]]:
    """(first-name tokens, last-name tokens), lowercase — NER lexicon."""
    firsts = frozenset(FIRST_NAMES)
    lasts = frozenset(LAST_NAMES)
    return firsts, lasts
