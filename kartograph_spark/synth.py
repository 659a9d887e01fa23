"""Deterministic synthetic transcript corpus + alias dictionary (FIXTURES F1/F2).

Pure function of (seed, scale): both the Spark pipeline and the pandas
oracle read the same parquet files, so inputs are byte-identical.  The
generator plants every extractable class from the rule taxonomy
(kartograph_spark.rules) plus the edge cases the reference's own tests
cover (EntityExtractor.test.ts malformed URNs, hyphen/underscore/dotted
ids, duplicate URNs in one turn), alias variants for linking, type-case
variants for normalization, and a hot entity (~30% of verb mentions) for
skew handling.

Scale knobs follow FIXTURES F5:
  small  (n_conv=200,    ~5k turns)    — pytest correctness vs oracle
  medium (n_conv=5000,   ~150k turns)  — bench + skew validation
  bench  (n_conv=50000,  ~1.5M turns)  — local[8] vs local[32] scaling runs
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd

SEED = 42

#: bump when generator CONTENT changes (new planted patterns, template or
#: pool edits): corpus directories embed this tag, so stale exists-checked
#: corpora from earlier generator versions are never silently reused.
#: v3 = round 4, plants the full HIGH-confidence verb tier (integrates
#: with / calls / owned by / developed by / monitored via).
#: v4 = round 5, plants the MEDIUM-confidence indirect-mention tier
#: (running on / runs on / depends on / connects to / stores data in /
#: hosted in <region> / in the <env> environment) plus nested-adjacency
#: fixtures mixing MEDIUM and HIGH phrases in one turn.
#: v5 = round 5, adds tool-column variety (usedTool emission incl. a
#: dictionary-linkable tool name) and E3 structured JSON-blob turns
#: (kind-field + field-combination type detection).
#: v6 = round 5, plants LOW-confidence log-only phrases (vague plurals,
#: ambiguous references, conditional mentions — PROCESS.md:2158-2163).
#: v7 = round 5, LOW phrases join the templated filler so they appear at
#: corpus frequency, not just in the handwritten pool.
#: v8 = round 5, E3 path-pattern blobs ("path": /services|namespaces|
#: users/ -> type, checked before the kind field, PROCESS.md:1048-1054).
#: v9 = round 5, plants the rank-vs-position dedup adversary: both
#: runs_on and running_on phrasings of ONE object in ONE turn (the kinds
#: share (pred, etype), so keep-first must follow kind_rank, not text
#: position — pins the edges-oracle ordering fix).
CORPUS_TAG = "v9"

SERVICES = ["Vault", "Hive", "Billing-API", "Checkout"]

TOOLS = [
    "Prometheus", "Grafana", "ArgoCD", "Vault", "Redis",
    "Kafka", "Spark", "Airflow", "Jenkins", "Istio",
    "Kubernetes",  # hot entity — oversampled below
]
LANGS = ["Go", "Python", "Java", "Rust", "TypeScript"]
TEAMS = ["Platform", "SRE", "Data-Eng", "Security"]
DBS = ["PostgreSQL", "MongoDB", "Cassandra"]

# E1 URN pool: includes hyphen/underscore/dotted/numeric ids and
# type-case/plural variants of the same logical entity (canonicalization
# fixtures) — EntityExtractor.test.ts cases.
URN_POOL = [
    "urn:Application:payment-service",
    "urn:Application:api-gateway",
    "urn:Application:auth-service",
    "urn:Application:user-service",
    "urn:Namespace:kube_system",
    "urn:Route:api_v2_endpoint",
    "urn:Application:my-service_v2",
    "urn:Service:api.v2",
    "urn:Service:node-42",
    "urn:Service:payment-api",
    "urn:service:payment-api",       # lowercase type variant
    "urn:Services:payment-api",      # plural type variant
    "urn:Team:platform",
    "urn:Database:postgresql",
]

EMAILS = [
    "alice@example.com", "Bob.Smith@Example.COM", "sre-team@company.io",
    "oncall+page@ops.example.org",
]
URLS = [
    "https://github.com/org/payment-api",
    "https://github.com/org/infra-tools",
    "http://internal.example.com/runbooks/db",
]
SLACKS = ["#incident-response", "#platform_eng", "#data-eng"]

MALFORMED = ["<urn:missing>", "<urn::x>", "<urn:>", "<urn:Type>"]


def _build_text_pool(rng: np.random.Generator, n: int = 3000) -> list[str]:
    """Pool of deterministic turn texts covering all pattern classes."""
    pool: list[str] = []
    add = pool.append

    # Handwritten edge cases (always present, mirrors reference unit tests)
    add("The service <urn:Application:payment-service> handles payments.")
    add(
        "The <urn:Application:api-gateway> routes to <urn:Application:auth-service>"
        " and <urn:Application:user-service>."
    )
    add("Found <urn:Namespace:kube_system> namespace.")
    add("<urn:Service:api-gateway-service>")
    add("<urn:Route:api_v2_endpoint>")
    add("<urn:Application:my-service_v2>")
    add(
        "Dup in one turn: <urn:Service:payment-api> again <urn:Service:payment-api>."
    )
    add("Case variants: <urn:service:payment-api> and <urn:Services:payment-api>.")
    add("Weird but valid: <urn:Service:api.v2> and <urn:Service:node-42>.")
    for bad in MALFORMED:
        add(f"Malformed mention {bad} should extract nothing.")
    add("Literal trap: value is None and {json: like} [array] braces.")
    add("This service uses Prometheus for metrics and is maintained by the Platform team.")
    add("Deployed via ArgoCD to production. The backend is written in Go.")
    add("It is backed by PostgreSQL and uses Redis for caching.")
    add("Contact alice@example.com or join #incident-response for help.")
    add("Repo at https://github.com/org/payment-api (see #platform_eng).")
    add("The payment-api service (aka payment_service, Payment API) uses Kafka.")
    # full HIGH-confidence verb tier (PROCESS.md:2211-2218): integration,
    # ownership, development and monitoring phrasings
    add("The ingest service is owned by SRE and monitored via Grafana dashboards.")
    # sentence-final object: the charset admits '.', so the trailing
    # period joins the token ('urn:Tool:grafana.') — a deliberate noisy-
    # surface fixture (slug/URN encoding must cope; linking won't match)
    add("That job is monitored via Grafana.")
    add("It integrates with GitHub API and calls Vault for secrets.")
    add("The console was developed by the Advanced Cluster Security team.")
    add(
        "Billing is owned by the Platform org, integrates with Stripe,"
        " and calls Checkout on every purchase."
    )
    # MEDIUM-confidence indirect tier (PROCESS.md:2149-2156): entity
    # extracted, relationship review-flagged — planted alongside HIGH
    # phrases so the tiers interleave within single turns
    add("The API is running on AWS and hosted in us-east-1 region.")
    add("It runs on OpenShift in the production environment.")
    add("The exporter depends on Kafka and connects to Splunk.")
    add("Nightly job stores data in S3; alerts land in #data-eng.")
    add(
        "Service <urn:Application:payment-service> is running on AWS"
        " but uses Prometheus for metrics."  # MEDIUM then HIGH, one anchor
    )
    add(
        "The gateway runs on Kubernetes uses Docker team conventions."
        # adjacent MEDIUM object then HIGH verb: single-token object spans
        # must not swallow the following 'uses Docker' mention
    )
    add("Deployed by hand in the staging environment, hosted in eu-west-1 region.")
    # rank-vs-position dedup adversary: runs_on appears FIRST in the
    # text but running_on has the lower kind_rank — both collapse to
    # (runsOn, urn:Platform:aws) and the extractor keeps the lower rank
    add("It runs on AWS mostly; by night it is running on AWS too.")
    # E3 structured tool-output blobs (kind field + field combinations,
    # PROCESS.md:1044-1068); braces also exercise the literal trap rules
    add('Tool output: {"apiVersion": "apps/v1", "kind": "Deployment", "name": "payment-api"}')
    add('Result: {"name": "billing", "owner": "sre", "endpoints": ["/api/v1"]}')
    add('Got {"name": "checkout", "cluster": "prod-east", "namespace": "shop"}')
    add('Partial blob {"kind": "ConfigMap", "name": "settings"} has no apiVersion.')
    add('No identity here: {"apiVersion": "v1", "kind": "Secret", "data": "x"}')
    # E3 path-pattern rule (checked FIRST): path type beats the kind field
    add('Read {"path": "/data/services/pay.yml", "name": "pay-svc"} ok.')
    add('Loaded {"path": "/data/namespaces/shop.yml", "name": "shop-ns", "apiVersion": "v1", "kind": "ConfigMap"}')
    add('Fetched {"path": "/data/users/jdoe.yml", "name": "jdoe"} fine.')
    # LOW-confidence tier (log for manual review, never extracted)
    add("We evaluated various tools last quarter; multiple services were affected.")
    add("Check the database first, then restart the pipeline if it lags.")
    add("It may use Redis if caching is enabled, otherwise plain files.")
    add("Several systems talk to the cluster during failover drills.")

    # Templated filler
    tools = np.array(TOOLS)
    # Hot-entity skew: Kubernetes dominates verb mentions (~30%)
    tool_w = np.full(len(tools), 0.7 / (len(tools) - 1))
    tool_w[-1] = 0.3
    langs = np.array(LANGS)
    teams = np.array(TEAMS)
    dbs = np.array(DBS)
    urns = np.array(URN_POOL)
    emails = np.array(EMAILS)
    urls = np.array(URLS)
    slacks = np.array(SLACKS)

    templates = [
        "Investigating latency: service uses {tool} and is written in {lang}.",
        "The pipeline is deployed via {tool} and maintained by the {team} team.",
        "Storage layer backed by {db}; dashboards at {url}.",
        "Check <{urn}> — it uses {tool}. Ping {email} or {slack}.",
        "Rollout status for <{urn}> and <{urn2}> looks good.",
        "No extractables in this turn, just ordinary prose about the system.",
        "Plain discussion of throughput and batch sizes with no entities.",
        "It uses {tool} and also uses {tool2}; both maintained by the {team} team.",
        "Runbook {url} says the job is written in {lang} and backed by {db}.",
        "Alert in {slack}: <{urn}> degraded, contact {email}.",
        # alias-surface verb mentions: derived Tool URNs that the alias
        # dictionary re-links to their canonical entities (J7 + CC fixtures)
        "Billing flow uses Payment-API for settlement.",
        "The ingest job is deployed via K8s and uses Payment_Service.",
        # round-4 HIGH-tier verbs (ownership / integration / monitoring)
        "The operator is owned by {team} and monitored via {tool} alerts.",
        "It integrates with {tool} API and calls {svc} for data.",
        "The dashboard was developed by the {team} team; alerts in {slack}.",
        "Check <{urn}>: owned by {team}, calls {svc}, monitored via {tool} panels.",
        # round-5 MEDIUM tier (indirect mentions -> review flags)
        "The worker is running on {tool} and depends on {svc} at peak.",
        # round-5 LOW tier (log-only): vague / ambiguous / conditional
        "We looked at various tools; it may use {tool} if the quota allows.",
        "Cleanup scans multiple services and compacts the database nightly.",
        "Replica set runs on {tool}, hosted in us-east-1 region.",
        "Batch loader stores data in {db} and connects to {svc} nightly.",
        "Check <{urn}>: running on {tool} in the production environment.",
    ]
    svcs = np.array(SERVICES)
    while len(pool) < n:
        t = templates[int(rng.integers(0, len(templates)))]
        txt = t.format(
            tool=rng.choice(tools, p=tool_w),
            tool2=rng.choice(tools, p=tool_w),
            lang=rng.choice(langs),
            team=rng.choice(teams),
            db=rng.choice(dbs),
            urn=rng.choice(urns),
            urn2=rng.choice(urns),
            email=rng.choice(emails),
            url=rng.choice(urls),
            slack=rng.choice(slacks),
            svc=rng.choice(svcs),
        )
        pool.append(txt)
    return pool


def gen_transcripts(
    n_conv: int = 200,
    mean_turns: int = 24,
    n_long: int = 2,
    long_turns: int = 500,
    seed: int = SEED,
) -> pd.DataFrame:
    """Generate the transcripts table (conv_id, turn_idx, role, text, tool, ts)."""
    rng = np.random.default_rng(seed)
    pool = np.array(_build_text_pool(rng), dtype=object)

    turns_per_conv = rng.poisson(mean_turns, size=n_conv).clip(2, None)
    turns_per_conv[:n_long] = long_turns  # long-conversation fixtures

    conv_ids = np.repeat(
        np.array([f"conv-{i:06d}" for i in range(n_conv)], dtype=object),
        turns_per_conv,
    )
    turn_idx = np.concatenate([np.arange(k) for k in turns_per_conv])
    n = len(conv_ids)

    role = np.where(turn_idx % 2 == 0, "user", "assistant")
    text = pool[rng.integers(0, len(pool), size=n)]
    # tool-bearing turns (ThinkingStep toolName analog): mixed-case and
    # underscore names exercise the slug rule; 'Vault' collides with the
    # alias dictionary's tool vocabulary (cross-source linking fixture)
    tool_pool = np.array(["query_dgraph", "web_search", "Vault"], dtype=object)
    tool = np.where(
        (role == "assistant") & (rng.random(n) < 0.2),
        tool_pool[rng.integers(0, len(tool_pool), size=n)],
        None,
    )
    conv_ordinal = np.repeat(np.arange(n_conv), turns_per_conv)
    base = pd.Timestamp("2026-01-01T00:00:00Z").value // 10**9
    ts = (
        pd.to_datetime(base + conv_ordinal * 3600 + turn_idx * 30, unit="s", utc=True)
        .tz_localize(None)
        .astype("datetime64[us]")  # Spark can't scan NANOS parquet timestamps
    )

    df = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx.astype("int32"),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )
    # Shuffle physical row order: correctness must come from explicit
    # (conv_id, turn_idx) window ordering, never storage order (FIXTURES F1).
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def gen_alias_dictionary(seed: int = SEED) -> pd.DataFrame:
    """Alias dictionary (FIXTURES F2): alias_norm -> canonical entity.

    Includes alias variants of one entity, a colliding blocking key
    ('gateway' maps to two canonicals — loader keeps min canonical_urn),
    and identity rows for the tool vocabulary incl. the hot entity.
    """
    rows: list[tuple[str, str, str, str]] = []
    # alias variants of the same entity (linking + canonicalization fixture)
    for alias in ("payment api", "payment service", "payment-api svc"):
        rows.append((alias, "urn:Service:payment-api", "Service", "Payment API"))
    # colliding blocking key
    rows.append(("gateway", "urn:Application:api-gateway", "Application", "API Gateway"))
    rows.append(("gateway", "urn:Service:edge-gateway", "Service", "Edge Gateway"))
    # hot-entity alias (K8s -> Kubernetes)
    rows.append(("k8s", "urn:Tool:kubernetes", "Tool", "Kubernetes"))
    # tool vocabulary identity rows (incl. hot entity kubernetes)
    for t in TOOLS:
        rows.append((t.lower(), f"urn:Tool:{t.lower()}", "Tool", t))
    for lang in LANGS:
        rows.append((lang.lower(), f"urn:ProgrammingLanguage:{lang.lower()}", "ProgrammingLanguage", lang))
    for team in TEAMS:
        norm = team.lower().replace("-", " ")
        rows.append((norm, f"urn:Team:{norm.replace(' ', '-')}", "Team", team))
    for db in DBS:
        rows.append((db.lower(), f"urn:Database:{db.lower()}", "Database", db))
    # service vocabulary for the round-4 "calls X" tier.  Vault is
    # deliberately OMITTED: its "vault" alias already maps to
    # urn:Tool:vault, so "calls Vault" mentions (urn:Service:vault) link
    # across types through the dictionary — a cross-type merge fixture.
    for svc in SERVICES:
        if svc == "Vault":
            continue
        norm = svc.lower().replace("-", " ")
        rows.append((norm, f"urn:Service:{svc.lower()}", "Service", svc))
    # filler rows to reach dictionary scale (~500) with unique keys
    rng = np.random.default_rng(seed)
    for i in range(460):
        rows.append(
            (
                f"synthetic alias {i}",
                f"urn:Service:synthetic-{i}",
                "Service",
                f"Synthetic {i}",
            )
        )
    df = pd.DataFrame(
        rows, columns=["alias_norm", "canonical_urn", "entity_type", "canonical_name"]
    )
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def write_corpus(out_dir: str, n_conv: int = 200, seed: int = SEED, **kw) -> dict:
    """Write transcripts.parquet + alias_dictionary.parquet; returns stats.

    Large corpora are written as a DIRECTORY of part files (~25k turns
    each) — the layout a real many-file/Iceberg table has, so the Spark
    scan parallelizes natively with no repartition; pandas reads the
    directory transparently.  Small corpora stay single-file.
    """
    os.makedirs(out_dir, exist_ok=True)
    tr = gen_transcripts(n_conv=n_conv, seed=seed, **kw)
    al = gen_alias_dictionary(seed=seed)
    tr_path = os.path.join(out_dir, "transcripts.parquet")
    n_files = max(1, len(tr) // 25_000)
    # Build the full replacement under a temp name FIRST, then swap: the
    # old layout stays readable for the whole generation window, so a
    # concurrent reader (e.g. the driver running queries and oracles in
    # separate processes) never sees a partial OR absent corpus — only the
    # complete old layout or the complete new one.
    tmp = tr_path + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    elif os.path.isfile(tmp):
        os.remove(tmp)
    if n_files == 1:
        tr.to_parquet(tmp, index=False, row_group_size=8192)
    else:
        os.makedirs(tmp, exist_ok=True)
        per = (len(tr) + n_files - 1) // n_files
        for i in range(n_files):
            tr.iloc[i * per : (i + 1) * per].to_parquet(
                os.path.join(tmp, f"part-{i:05d}.parquet"),
                index=False,
                row_group_size=8192,
            )
    if os.path.isfile(tmp) and not os.path.isdir(tr_path):
        os.replace(tmp, tr_path)  # atomic file-over-file / file-into-place
    else:
        # dir layouts (either side): move the old aside, rename the new in,
        # drop the old — the path is absent only between two renames
        old = tr_path + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        elif os.path.isfile(old):
            os.remove(old)
        had_old = os.path.exists(tr_path)
        if had_old:
            os.rename(tr_path, old)
        os.rename(tmp, tr_path)
        if had_old:
            shutil.rmtree(old) if os.path.isdir(old) else os.remove(old)
    al_tmp = os.path.join(out_dir, "alias_dictionary.parquet.tmp")
    al.to_parquet(al_tmp, index=False)
    os.replace(al_tmp, os.path.join(out_dir, "alias_dictionary.parquet"))
    return {"turns": len(tr), "conversations": tr["conv_id"].nunique(), "aliases": len(al)}
