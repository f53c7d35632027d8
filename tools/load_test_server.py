"""Load generator for the serving daemon (`biom3_tpu.cli.run_server`).

Measures end-to-end request latency and throughput under concurrency, then
reads back the server's own batcher counters (occupancy is the number to
watch: the daemon's whole point is that concurrent clients coalesce into
fixed-shape device batches).

  python tools/load_test_server.py --base-url http://127.0.0.1:8000 \
      --clients 8 --requests 4 --num-replicas 1

Prints one JSON line with client-side p50/p95/throughput and the server's
/v1/metrics snapshot.
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import urllib.request


def _post(url: str, payload: dict, timeout: float) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def run_load(
    base_url: str,
    *,
    clients: int = 8,
    requests_per_client: int = 4,
    prompt: str = "membrane transport protein",
    num_replicas: int = 1,
    timeout_s: float = 600.0,
    endpoint: str = "generate",
    sequence: str | None = None,
) -> dict:
    """``endpoint="inpaint"`` posts ``sequence`` (a partial design with
    ``?`` unknowns) to ``/v1/inpaint`` instead; ``"mixed"`` alternates —
    even clients generate, odd clients inpaint — the realistic traffic
    shape for a continuous scheduler whose inpaint rows share generate
    dispatches.  Latency/occupancy semantics are identical."""
    if endpoint not in ("generate", "inpaint", "mixed"):
        raise ValueError(
            f"endpoint must be generate|inpaint|mixed, got {endpoint}"
        )
    if endpoint in ("inpaint", "mixed") and not sequence:
        raise ValueError(f"{endpoint} load needs a sequence")
    latencies: list[float] = []
    per_ep: dict[str, list[float]] = {"generate": [], "inpaint": []}
    errors: list[str] = []
    lock = threading.Lock()

    def client(cid: int) -> None:
        ep = endpoint
        if endpoint == "mixed":
            ep = "inpaint" if cid % 2 else "generate"
        for r in range(requests_per_client):
            payload = {"prompt": f"{prompt} #{cid}",
                       "num_replicas": num_replicas}
            if ep == "inpaint":
                payload["sequence"] = sequence
            t0 = time.perf_counter()
            try:
                out = _post(
                    f"{base_url}/v1/{ep}",
                    payload,
                    timeout_s,
                )
                ok = len(out["results"][0]["sequences"]) == num_replicas
                dt = time.perf_counter() - t0
                with lock:
                    if ok:
                        latencies.append(dt)
                        per_ep[ep].append(dt)
                    else:
                        errors.append(f"client {cid} req {r}: bad shape")
            except Exception as exc:  # noqa: BLE001 — recorded, not raised
                with lock:
                    errors.append(f"client {cid} req {r}: {exc}")

    t_start = time.perf_counter()
    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(clients)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    lat = sorted(latencies)
    n = len(lat)

    def pct(q: float) -> float | None:
        # nearest-rank percentile: ceil(q·n)-th order statistic
        import math

        return round(lat[max(0, math.ceil(q * n) - 1)], 3) if n else None

    report = {
        "endpoint": endpoint,
        "clients": clients,
        "requests": clients * requests_per_client,
        "completed": n,
        "errors": len(errors),
        "wall_s": round(wall, 3),
        "requests_per_s": round(n / wall, 3) if wall else None,
        "sequences_per_s": round(n * num_replicas / wall, 3) if wall else None,
        "latency_p50_s": pct(0.50),
        "latency_p95_s": pct(0.95),
    }
    if endpoint == "mixed":
        import math

        for ep, ls in per_ep.items():
            ls = sorted(ls)
            report[f"{ep}_p50_s"] = (
                round(ls[max(0, math.ceil(0.5 * len(ls)) - 1)], 3)
                if ls else None
            )
            report[f"{ep}_completed"] = len(ls)
    try:
        with urllib.request.urlopen(f"{base_url}/v1/metrics", timeout=30) as r:
            report["server_metrics"] = json.loads(r.read())
    except Exception as exc:  # noqa: BLE001
        report["server_metrics_error"] = str(exc)
    if errors:
        report["error_samples"] = errors[:5]
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", required=True)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=4,
                    help="sequential requests per client")
    ap.add_argument("--prompt", default="membrane transport protein")
    ap.add_argument("--num-replicas", type=int, default=1)
    ap.add_argument("--timeout-s", type=float, default=600.0)
    ap.add_argument("--endpoint", choices=["generate", "inpaint", "mixed"],
                    default="generate")
    ap.add_argument("--sequence", default=None,
                    help="partial design with '?' unknowns (inpaint mode)")
    args = ap.parse_args()
    report = run_load(
        args.base_url, clients=args.clients,
        requests_per_client=args.requests, prompt=args.prompt,
        num_replicas=args.num_replicas, timeout_s=args.timeout_s,
        endpoint=args.endpoint, sequence=args.sequence,
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
