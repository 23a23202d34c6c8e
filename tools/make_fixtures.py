#!/usr/bin/env python3
"""Author the reference-shaped bronze fixtures (FIXTURES.md §B) as JSONL
under src/main/resources/graft/fixtures/. Deterministic: re-running
produces byte-identical files. The country master and standard map are
the reference's own public config data
(/root/reference/config/master_country_crawler.json,
 /root/reference/config/standard_country_map.json); the rate / trends /
flight rows are synthetic but shaped per the reference record literals
(exchage_rate_crawler.py:266-275, google_trends_crawler.py:56-72,
 _archive/flight_price_preprocessing.py:3-49).
"""
import json
import os

REF = "/root/reference/config"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/main/resources/graft/fixtures")
os.makedirs(OUT, exist_ok=True)


def dump(name, rows):
    path = os.path.join(OUT, name)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False, sort_keys=True) + "\n")
    print(f"{name}: {len(rows)} rows")


# --- B2: 59-row country master (verbatim reference config values) -------
master = json.load(open(f"{REF}/master_country_crawler.json"))
dump("country_master.jsonl", [master[k] for k in sorted(master)])

# --- B3: 739-entry standard country map (key = lookup alias) ------------
# The dict KEY is the alias the processor looks up by; the VALUE carries
# the canonical korean_name the gold record emits — 514/739 entries are
# aliases whose canonical name differs from the key (e.g. "Argentina" ->
# "아르헨티나"), so both must survive the flattening
# (google_trends_processor.py:146-152).
std = json.load(open(f"{REF}/standard_country_map.json"))
dump("standard_country_map.jsonl", [
    {"lookup_key": k,
     "korean_name": std[k]["korean_name"],
     "english_name": std[k]["english_name"],
     "country_code_3": std[k]["country_code_3"],
     "country_code_2": std[k]["country_code_2"]}
    for k in sorted(std)])

# --- B2b: the same master data in its native dynamic-key {code3: {...}}
# object form — the S6 surface Bronze.readConfigMap transposes; its rows
# must equal the flattened country_master.jsonl (q42 pins that).
with open(os.path.join(OUT, "country_config.json"), "w") as f:
    json.dump({k: master[k] for k in sorted(master)}, f,
              ensure_ascii=False, sort_keys=True, indent=1)
print(f"country_config.json: 1 object, {len(master)} keys")

# --- B1: parsed exchange-rate scrape rows -------------------------------
# scenario per currency: (yearly, realtime, daily, {month_key: rate})
# USD: +4% -> score 30 | EUR: -2% -> 60, fans out to every eurozone member
# JPY: +15% -> clamp 0 | GBP: realtime only -> pct null -> 0.0
# CAD: yearly 0.0 (a "-" cell post-F1) -> pct null | THB: no realtime
# AUD: +2.5% -> 37.5   | XXX: unknown currency -> inner-join drop
scenarios = {
    "USD": (1350.0, 1404.0, 1390.0, {"202504": 1340.0, "202505": 1360.0, "202506": 1380.0}),
    "EUR": (1500.0, 1470.0, 1480.0, {"202505": 1490.0, "202506": 1495.0}),
    "JPY": (9.5, 10.925, 9.4, {"202506": 9.6}),
    "GBP": (None, 1750.0, None, {}),
    "CAD": (0.0, 1520.0, None, {}),
    "THB": (38.0, None, 37.6, {"202506": 37.5}),
    "AUD": (880.0, 902.0, 891.0, {"202505": 885.0, "202506": 895.0}),
    "XXX": (40.0, 42.0, None, {}),
}
have = {v["currency_code"] for v in master.values()}
assert all(c in have for c in scenarios if c != "XXX"), "currency not in master"
rates = []
for i, (ccy, (yearly, rt, daily, monthly)) in enumerate(sorted(scenarios.items())):
    ts = f"2025-07-0{(i % 7) + 1}T0{i % 10}:00:00"
    base = {"buy_rate": 0.0, "sell_rate": 0.0, "send_rate": 0.0,
            "receive_rate": 0.0, "crawled_at_utc": ts,
            "crawled_at_kst": ts.replace("T0", "T1")}
    def row(rtype, rate, mk=None):
        r = dict(base, currency_code=ccy, rate_type=rtype,
                 month_key=mk, standard_rate=rate)
        return r
    if rt is not None:
        rates.append(row("realtime", rt))
    if daily is not None:
        rates.append(row("daily_avg", daily))
    for mk in sorted(monthly):
        rates.append(row("monthly_avg", monthly[mk], mk))
    if yearly is not None:
        rates.append(row("yearly_avg", yearly))
dump("rates_raw.jsonl", rates)

# --- B4: long-form trends interest series -------------------------------
# 45 daily rows per keyword; last row is_partial (must be dropped).
# 화성 여행: zero until the last 10 days -> the keyword epsilon branch,
# AND absent from the standard map -> Unknown_* defaults. The anchor
# (해외여행) has prev>0 -> normal branch feeding anchor_growth.
# Japan 여행: reaches the map through an ALIAS key whose canonical
# korean_name differs ("Japan" -> "일본") — pins the alias->canonical
# rename (google_trends_processor.py:152).
keywords = ["일본 여행", "프랑스 여행", "미국 여행", "태국 여행",
            "베트남 여행", "스페인 여행", "해외여행", "화성 여행",
            "Japan 여행"]
std_keys = set(std)
for kw in keywords:
    stripped = kw.removesuffix(" 여행")
    if kw not in ("화성 여행", "해외여행"):
        assert stripped in std_keys, f"{stripped} not in standard map"
assert std["Japan"]["korean_name"] != "Japan"  # alias != canonical
trends = []
import datetime
d0 = datetime.date(2025, 5, 20)
for ki, kw in enumerate(keywords):
    for i in range(45):
        if kw == "화성 여행":
            interest = (3 * i) % 47 + 4 if i >= 35 else 0
        else:
            interest = (ki * 17 + i * 7) % 101
        trends.append({
            "date": (d0 + datetime.timedelta(days=i)).isoformat(),
            "keyword": kw, "interest": interest, "geo": "KR",
            "is_partial": i == 44, "batch_id": ki // 4})
dump("trends_interest.jsonl", trends)

# --- B5: nested flight itineraries (flight_price_preprocessing.py:3-49) -
AP = {
    "ICN": ("Seoul", "KR", 37.46, 126.44), "GMP": ("Seoul", "KR", 37.56, 126.79),
    "NRT": ("Tokyo", "JP", 35.76, 140.39), "KIX": ("Osaka", "JP", 34.43, 135.23),
    "CDG": ("Paris", "FR", 49.01, 2.55), "BKK": ("Bangkok", "TH", 13.69, 100.75),
    "SGN": ("Ho Chi Minh City", "VN", 10.82, 106.66),
}
def station(code):
    city, country, lat, lng = AP[code]
    return {"code": code, "city": {"name": city, "legacyId": sum(map(ord, code)) % 97},
            "country": {"code": country}, "gps": {"lat": lat, "lng": lng}}
def seg(src, dst, dep, arr, carrier, ccode, cabin, dur):
    return {"segment": {
        "source": {"station": station(src), "localTime": dep},
        "destination": {"station": station(dst), "localTime": arr},
        "carrier": {"name": carrier, "code": ccode},
        "cabinClass": cabin, "duration": dur}}
def itin(price, before, segs):
    p = {"amount": price}
    if before is not None:
        p["priceBeforeDiscount"] = before
    return {"price": p, "sector": {"sectorSegments": segs}}

# arrivals per (airport, month) designed for clean averages:
#   KIX m8: 450000 & 550000 -> avg 500000 (diffs -/+ 50000, pct -/+10.0)
#   NRT m7: 380000 alone -> diff 0 -> 동일/0
#   CDG m8: 900000 & 1100000 -> avg 1000000
#   BKK m7: 300000 alone | SGN m8: 250000 alone (VN: no 3-letter map hit)
flights = [
    {"itineraries": [
        itin(450000.0, None, [seg("ICN", "KIX", "2025-08-10T10:00:00", "2025-08-10T12:00:00", "AirGraft", "AG", "ECONOMY", 7200)]),
        itin(550000.0, 600000.0, [seg("GMP", "KIX", "2025-08-12T09:00:00", "2025-08-12T11:05:00", "AirGraft", "AG", "ECONOMY", 7500)]),
    ]},
    {"itineraries": [
        itin(380000.0, 380000.0, [seg("ICN", "NRT", "2025-07-21T13:30:00", "2025-07-21T15:40:00", "GraftJet", "GJ", "BUSINESS", 7800)]),
    ]},
    {"itineraries": [
        itin(900000.0, None, [
            seg("ICN", "BKK", "2025-08-01T08:00:00", "2025-08-01T12:00:00", "GraftJet", "GJ", "ECONOMY", 14400),
            seg("BKK", "CDG", "2025-08-01T14:00:00", "2025-08-02T06:00:00", "GraftJet", "GJ", "ECONOMY", 43200)]),
        itin(1100000.0, 1250000.0, [
            seg("ICN", "CDG", "2025-08-03T10:00:00", "2025-08-03T22:00:00", "AirGraft", "AG", "PREMIUM_ECONOMY", 43200)]),
    ]},
    {"itineraries": [
        itin(300000.0, None, [seg("GMP", "BKK", "2025-07-15T07:00:00", "2025-07-15T11:00:00", "AirGraft", "AG", "ECONOMY", 14400)]),
        itin(250000.0, 275000.0, [seg("ICN", "SGN", "2025-08-20T16:00:00", "2025-08-20T20:10:00", "GraftJet", "GJ", "ECONOMY", 15000)]),
    ]},
]
dump("flights_raw.jsonl", flights)

# --- B6: city metadata with the "['ICN','GMP']" list-string form --------
dump("city_meta.jsonl", [
    {"airport_codes": "['ICN', 'GMP']", "final_city_code": "SEL"},
    {"airport_codes": "['NRT', 'HND']", "final_city_code": "TYO"},
    {"airport_codes": "['KIX', 'ITM']", "final_city_code": "OSA"},
    {"airport_codes": "['CDG', 'ORY']", "final_city_code": "PAR"},
    {"airport_codes": "['BKK', 'DMK']", "final_city_code": "BKK"},
    {"airport_codes": None, "final_city_code": "XXX"},  # P8 drop
])
