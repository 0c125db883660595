"""Kubernetes PodList JSON → pod-metadata dim parquet for log enrichment.

Parity: the reference's kubernetes_logs source annotates each log event
with pod metadata fetched live from the Kubernetes API
(src/sources/kubernetes_logs/pod_metadata_annotator.rs — kubernetes.
pod_name/pod_namespace/pod_uid/pod_ip/pod_ips/pod_labels/pod_annotations/
pod_node_name/pod_owner/container_name/container_image/container_image_id).
The Spark-side engine shape is an equality join against a broadcastable
dimension (operators/enrich.py), mirroring tools/mmdb_to_ranges.py for
geoip: this tool closes the gap by converting a PodList dump — the PUBLIC
Kubernetes API shape that ``kubectl get pods -A -o json`` emits
(https://kubernetes.io/docs/reference/kubernetes-api/workload-resources/pod-v1/)
— into that dim table, one row per (pod, container).

Usage:
    kubectl get pods -A -o json > pods.json        # on the cluster
    python tools/k8s_metadata_dump.py pods.json k8s_dim.parquet
    # then: sources.kubernetes.annotate_pod_metadata(logs_df, dim_df)

The conversion runs driver-side (a pod inventory is a dimension,
thousands of rows, not data-plane input); the OUTPUT is the distributed
artifact, joined per the reference's (namespace, pod, uid, container)
log-path identity (path_helpers.rs).
"""

from __future__ import annotations

import json
import sys
from typing import Any


def _owner(meta: dict) -> str | None:
    """``{kind}/{name}`` of the first ownerReference
    (pod_metadata_annotator.rs:296-309)."""
    refs = meta.get("ownerReferences") or []
    if not refs:
        return None
    return f"{refs[0].get('kind')}/{refs[0].get('name')}"


def pods_to_rows(podlist: dict[str, Any]) -> list[dict[str, Any]]:
    """PodList JSON → one dim row per (pod, container).

    Pods with no spec containers still yield one pod-level row (container
    fields null) so pod-scoped joins never lose pods."""
    rows: list[dict[str, Any]] = []
    for pod in podlist.get("items", []):
        meta = pod.get("metadata", {})
        spec = pod.get("spec", {})
        status = pod.get("status", {})
        statuses = {
            c.get("name"): c for c in status.get("containerStatuses", [])
        }
        base = {
            "pod_name": meta.get("name"),
            "pod_namespace": meta.get("namespace"),
            "pod_uid": meta.get("uid"),
            "pod_ip": status.get("podIP"),
            "pod_ips": [
                e.get("ip") for e in status.get("podIPs", []) if e.get("ip")
            ],
            "pod_labels": dict(meta.get("labels") or {}),
            "pod_annotations": dict(meta.get("annotations") or {}),
            "pod_node_name": spec.get("nodeName"),
            "pod_owner": _owner(meta),
        }
        containers = spec.get("containers") or [{}]
        for c in containers:
            st = statuses.get(c.get("name"), {})
            rows.append(
                {
                    **base,
                    "container_name": c.get("name"),
                    "container_image": c.get("image"),
                    "container_image_id": st.get("imageID"),
                    "container_id": st.get("containerID"),
                }
            )
    return rows


_SCHEMA_DDL = (
    "pod_name string, pod_namespace string, pod_uid string, pod_ip string, "
    "pod_ips array<string>, pod_labels map<string,string>, "
    "pod_annotations map<string,string>, pod_node_name string, "
    "pod_owner string, container_name string, container_image string, "
    "container_image_id string, container_id string"
)


def write_parquet(rows: list[dict[str, Any]], out_path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    s = pa.string()
    kv = pa.map_(s, s)  # explicit: inference would type dicts as structs
    schema = pa.schema(
        [
            ("pod_name", s), ("pod_namespace", s), ("pod_uid", s),
            ("pod_ip", s), ("pod_ips", pa.list_(s)), ("pod_labels", kv),
            ("pod_annotations", kv), ("pod_node_name", s), ("pod_owner", s),
            ("container_name", s), ("container_image", s),
            ("container_image_id", s), ("container_id", s),
        ]
    )
    cols = [f.name for f in schema]
    table = pa.Table.from_pylist(
        [{c: r.get(c) for c in cols} for r in rows], schema=schema
    )
    pq.write_table(table, out_path)


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(
            "usage: python tools/k8s_metadata_dump.py pods.json out.parquet",
            file=sys.stderr,
        )
        return 2
    with open(argv[1]) as fh:
        podlist = json.load(fh)
    rows = pods_to_rows(podlist)
    write_parquet(rows, argv[2])
    print(f"{len(rows)} (pod, container) rows -> {argv[2]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
