"""In-process temporal knowledge graph with TPU-backed fact search.

Re-designs the role of the reference's vendored graphiti + Neo4j stack
(super_rag/graphiti/, 32k LoC; SURVEY.md 2.8): episodes are ingested into
(node, edge) tables with temporal validity, and hybrid fact search runs
on the SAME device engine as document retrieval (dense + BM25 + RRF over
edge facts) instead of Cypher fulltext + cosine inside Neo4j — the
'optionally back KG search by the same TPU dense/lexical engine' path
from SURVEY.md 2.9, made the default.

Capabilities mirrored from graphiti: add_episode (extract -> upsert
nodes/edges, invalidate superseded duplicates), hybrid search with
center-node distance boost, label listing, subgraph extraction for viz,
group scoping by collection, delete by episode/group.
"""

from __future__ import annotations

import time
from typing import Callable, Optional


from super_rag_tpu.engine.collection import CollectionEngine
from super_rag_tpu.engine.index import IndexSpec
from super_rag_tpu.kg.extract import Triple, extract
from super_rag_tpu.store.db import Database, new_id

_KG_SCHEMA = """
CREATE TABLE IF NOT EXISTS kg_node (
  id TEXT PRIMARY KEY, group_id TEXT NOT NULL, name TEXT NOT NULL,
  name_norm TEXT NOT NULL, label TEXT DEFAULT 'Entity', created REAL NOT NULL,
  UNIQUE(group_id, name_norm)
);
CREATE TABLE IF NOT EXISTS kg_edge (
  id TEXT PRIMARY KEY, group_id TEXT NOT NULL,
  source_id TEXT NOT NULL, target_id TEXT NOT NULL,
  relation TEXT NOT NULL, fact TEXT NOT NULL,
  episode_id TEXT DEFAULT '', row_id INTEGER DEFAULT -1,
  valid_at REAL NOT NULL, invalid_at REAL DEFAULT NULL,
  created REAL NOT NULL
);
CREATE INDEX IF NOT EXISTS idx_kg_edge_group ON kg_edge(group_id);
CREATE TABLE IF NOT EXISTS kg_episode (
  id TEXT PRIMARY KEY, group_id TEXT NOT NULL, source TEXT DEFAULT '',
  content_preview TEXT DEFAULT '', created REAL NOT NULL
);
"""


class KnowledgeGraphService:
    def __init__(self, db: Database, completion: Optional[Callable] = None,
                 embed_dim: int = 128):
        self.db = db
        self.completion = completion
        self.embed_dim = embed_dim
        db._conn.executescript(_KG_SCHEMA)
        self._engines: dict[str, CollectionEngine] = {}

    # -- fact index (device) ----------------------------------------------------

    def _engine(self, group_id: str) -> CollectionEngine:
        eng = self._engines.get(group_id)
        if eng is None:
            eng = CollectionEngine(
                IndexSpec(dim=self.embed_dim, vocab_size=1 << 14)
            )
            self._engines[group_id] = eng
            # hydrate from persisted edges (restart path)
            rows = self.db.query(
                "SELECT id, fact FROM kg_edge WHERE group_id=?"
                " AND invalid_at IS NULL ORDER BY created",
                (group_id,),
            )
            if rows:
                ids = eng.ingest([r["fact"] for r in rows],
                                 metadata=[{"edge_id": r["id"]} for r in rows])
                for r, row_id in zip(rows, ids):
                    self.db.execute(
                        "UPDATE kg_edge SET row_id=? WHERE id=?",
                        (row_id, r["id"]),
                    )
        return eng

    # -- node/edge upserts ----------------------------------------------------------

    def _upsert_node(self, group_id: str, name: str) -> str:
        norm = " ".join(name.lower().split())
        row = self.db.query_one(
            "SELECT id FROM kg_node WHERE group_id=? AND name_norm=?",
            (group_id, norm),
        )
        if row:
            return row["id"]
        nid = new_id("kgn")
        self.db.execute(
            "INSERT INTO kg_node (id,group_id,name,name_norm,created)"
            " VALUES (?,?,?,?,?)",
            (nid, group_id, name, norm, time.time()),
        )
        return nid

    def add_episode(self, group_id: str, text: str, source: str = "",
                    triples: Optional[list[Triple]] = None) -> dict:
        """Extract triples and upsert them (graphiti add_episode analog).

        A new edge with the same (source, relation, target) invalidates
        the previous one (temporal supersedence)."""
        eid = new_id("kge")
        self.db.execute(
            "INSERT INTO kg_episode (id,group_id,source,content_preview,created)"
            " VALUES (?,?,?,?,?)",
            (eid, group_id, source, text[:300], time.time()),
        )
        triples = triples if triples is not None else extract(
            text, self.completion
        )
        eng = self._engine(group_id)
        added = []
        now = time.time()
        for t in triples:
            sid = self._upsert_node(group_id, t.source)
            tid = self._upsert_node(group_id, t.target)
            # supersede older identical-relation edges
            old = self.db.query(
                "SELECT id, row_id FROM kg_edge WHERE group_id=? AND source_id=?"
                " AND target_id=? AND relation=? AND invalid_at IS NULL",
                (group_id, sid, tid, t.relation),
            )
            for o in old:
                self.db.execute(
                    "UPDATE kg_edge SET invalid_at=? WHERE id=?", (now, o["id"])
                )
                if o["row_id"] >= 0:
                    eng.delete([o["row_id"]])
            edge_id = new_id("kged")
            rows = eng.ingest([t.fact], metadata=[{"edge_id": edge_id}])
            self.db.execute(
                "INSERT INTO kg_edge (id,group_id,source_id,target_id,relation,"
                "fact,episode_id,row_id,valid_at,created)"
                " VALUES (?,?,?,?,?,?,?,?,?,?)",
                (edge_id, group_id, sid, tid, t.relation, t.fact, eid,
                 rows[0], now, now),
            )
            added.append(edge_id)
        return {"episode_id": eid, "edges": added, "triples": len(added)}

    def add_episode_bulk(self, group_id: str, texts: list[str],
                         source: str = "") -> dict:
        """Batch episode ingestion (graphiti add_episode_bulk analog,
        graphiti_core/graphiti.py:1023): extract across all chunks first,
        dedup nodes once for the whole batch, then insert every fact with
        ONE batched device write instead of per-triple ingests."""
        eng = self._engine(group_id)
        now = time.time()
        episode_ids = []
        all_triples: list[tuple[str, Triple]] = []
        for text in texts:
            eid = new_id("kge")
            episode_ids.append(eid)
            self.db.execute(
                "INSERT INTO kg_episode (id,group_id,source,content_preview,"
                "created) VALUES (?,?,?,?,?)",
                (eid, group_id, source, text[:300], now),
            )
            for t in extract(text, self.completion):
                all_triples.append((eid, t))

        # one-pass node dedup across the whole batch
        node_ids: dict[str, str] = {}
        for _eid, t in all_triples:
            for name in (t.source, t.target):
                norm = " ".join(name.lower().split())
                if norm not in node_ids:
                    node_ids[norm] = self._upsert_node(group_id, name)

        # within-batch + vs-store supersedence, newest wins
        seen_keys: dict[tuple, int] = {}
        kept: list[tuple[str, Triple]] = []
        for eid, t in all_triples:
            key = (" ".join(t.source.lower().split()), t.relation,
                   " ".join(t.target.lower().split()))
            if key in seen_keys:
                kept[seen_keys[key]] = (eid, t)  # later chunk supersedes
            else:
                seen_keys[key] = len(kept)
                kept.append((eid, t))
        edge_rows = []
        for eid, t in kept:
            sid = node_ids[" ".join(t.source.lower().split())]
            tid = node_ids[" ".join(t.target.lower().split())]
            for o in self.db.query(
                "SELECT id, row_id FROM kg_edge WHERE group_id=? AND"
                " source_id=? AND target_id=? AND relation=? AND"
                " invalid_at IS NULL",
                (group_id, sid, tid, t.relation),
            ):
                self.db.execute(
                    "UPDATE kg_edge SET invalid_at=? WHERE id=?",
                    (now, o["id"]),
                )
                if o["row_id"] >= 0:
                    eng.delete([o["row_id"]])
            edge_rows.append((new_id("kged"), sid, tid, t, eid))

        if edge_rows:
            rows = eng.ingest(
                [e[3].fact for e in edge_rows],
                metadata=[{"edge_id": e[0]} for e in edge_rows],
            )
            for (edge_id, sid, tid, t, eid), row_id in zip(edge_rows, rows):
                self.db.execute(
                    "INSERT INTO kg_edge (id,group_id,source_id,target_id,"
                    "relation,fact,episode_id,row_id,valid_at,created)"
                    " VALUES (?,?,?,?,?,?,?,?,?,?)",
                    (edge_id, group_id, sid, tid, t.relation, t.fact, eid,
                     row_id, now, now),
                )
        return {"episode_ids": episode_ids,
                "edges": [e[0] for e in edge_rows],
                "triples": len(edge_rows)}

    def delete_group(self, group_id: str) -> None:
        self.db.execute("DELETE FROM kg_edge WHERE group_id=?", (group_id,))
        self.db.execute("DELETE FROM kg_node WHERE group_id=?", (group_id,))
        self.db.execute("DELETE FROM kg_episode WHERE group_id=?", (group_id,))
        self._engines.pop(group_id, None)

    def delete_episode(self, group_id: str, episode_id: str) -> None:
        eng = self._engine(group_id)
        rows = self.db.query(
            "SELECT row_id FROM kg_edge WHERE group_id=? AND episode_id=?",
            (group_id, episode_id),
        )
        eng.delete([r["row_id"] for r in rows if r["row_id"] >= 0])
        self.db.execute(
            "DELETE FROM kg_edge WHERE group_id=? AND episode_id=?",
            (group_id, episode_id),
        )

    # -- search ----------------------------------------------------------------------

    def search(self, group_id: str, query: str, top_k: int = 5,
               center_node: Optional[str] = None,
               rerank: Optional[str] = None) -> list[dict]:
        """Hybrid fact search (+ optional neighbor boost around a node).

        ``rerank='mmr'`` applies maximal-marginal-relevance diversity over
        the fact embeddings (graphiti's MMR reranker family,
        search/search.py:54-454)."""
        eng = self._engine(group_id)
        if eng.index.size == 0:
            return []
        hits = eng.search(query, top_k=top_k * 2, mode="hybrid")
        if rerank == "mmr" and len(hits) > 1:
            hits = self._mmr(query, hits, top_k * 2)
        boost_ids: set[str] = set()
        if center_node:
            node = self.db.query_one(
                "SELECT id FROM kg_node WHERE group_id=? AND name_norm=?",
                (group_id, " ".join(center_node.lower().split())),
            )
            if node:
                for e in self.db.query(
                    "SELECT id FROM kg_edge WHERE group_id=? AND invalid_at IS"
                    " NULL AND (source_id=? OR target_id=?)",
                    (group_id, node["id"], node["id"]),
                ):
                    boost_ids.add(e["id"])
        out = []
        for h in hits:
            edge = self.db.query_one(
                "SELECT e.*, s.name AS source_name, t.name AS target_name"
                " FROM kg_edge e JOIN kg_node s ON s.id=e.source_id"
                " JOIN kg_node t ON t.id=e.target_id WHERE e.id=?",
                (h.metadata.get("edge_id", ""),),
            )
            if edge is None or edge["invalid_at"] is not None:
                continue
            score = h.score * (2.0 if edge["id"] in boost_ids else 1.0)
            out.append({
                "fact": edge["fact"], "score": score,
                "source": edge["source_name"], "target": edge["target_name"],
                "relation": edge["relation"], "edge_id": edge["id"],
            })
        out.sort(key=lambda r: -r["score"])
        return out[:top_k]

    def _mmr(self, query: str, hits, k: int, lam: float = 0.6):
        """Maximal marginal relevance over fact embeddings: greedy pick
        balancing query relevance against similarity to already-picked
        facts (diversity)."""
        import numpy as np

        embedder = None
        for e in self._engines.values():
            embedder = e.embedder
            break
        if embedder is None:
            return hits
        texts = [h.text for h in hits]
        emb = np.asarray(embedder.embed([query] + texts), np.float32)
        nrm = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = emb / np.where(nrm > 0, nrm, 1.0)
        qv, dv = emb[0], emb[1:]
        rel = dv @ qv
        picked: list[int] = []
        rest = list(range(len(hits)))
        while rest and len(picked) < k:
            if not picked:
                j = int(np.argmax([rel[i] for i in rest]))
            else:
                pv = dv[picked]
                mmr = [lam * rel[i] - (1 - lam) * float((dv[i] @ pv.T).max())
                       for i in rest]
                j = int(np.argmax(mmr))
            picked.append(rest.pop(j))
        return [hits[i] for i in picked]

    # -- communities ---------------------------------------------------------------------

    def communities(self, group_id: str, max_members: int = 8) -> list[dict]:
        """Connected-component communities over the valid-edge graph with
        degree-ranked members and a summary line (graphiti community
        nodes analog; LLM summary when a completion client exists)."""
        edges = self.db.query(
            "SELECT source_id, target_id FROM kg_edge WHERE group_id=?"
            " AND invalid_at IS NULL",
            (group_id,),
        )
        if not edges:
            return []
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        degree: dict[str, int] = {}
        for e in edges:
            a, b = find(e["source_id"]), find(e["target_id"])
            if a != b:
                parent[a] = b
            degree[e["source_id"]] = degree.get(e["source_id"], 0) + 1
            degree[e["target_id"]] = degree.get(e["target_id"], 0) + 1
        groups: dict[str, list[str]] = {}
        for nid in degree:
            groups.setdefault(find(nid), []).append(nid)
        names = {
            r["id"]: r["name"] for r in self.db.query(
                "SELECT id, name FROM kg_node WHERE group_id=?", (group_id,)
            )
        }
        out = []
        for j, (root, members) in enumerate(
            sorted(groups.items(), key=lambda kv: -len(kv[1]))
        ):
            members.sort(key=lambda n: -degree.get(n, 0))
            top = [names.get(n, n) for n in members[:max_members]]
            summary = f"Community of {len(members)} entities around " \
                      f"{', '.join(top[:3])}"
            if self.completion is not None:
                try:
                    summary = str(self.completion(
                        prompt="Summarize in one sentence the theme of a "
                               "knowledge-graph community containing: "
                               + ", ".join(top)
                    )).strip() or summary
                except Exception:  # noqa: BLE001 — offline fallback
                    pass
            out.append({
                "id": f"community-{j}", "size": len(members),
                "members": top, "summary": summary,
            })
        return out

    # -- introspection (labels / subgraph for viz) ---------------------------------------

    def labels(self, group_id: str) -> list[dict]:
        return self.db.query(
            "SELECT label, COUNT(*) AS count FROM kg_node WHERE group_id=?"
            " GROUP BY label",
            (group_id,),
        )

    def subgraph(self, group_id: str, node_name: Optional[str] = None,
                 limit: int = 200) -> dict:
        if node_name:
            node = self.db.query_one(
                "SELECT id FROM kg_node WHERE group_id=? AND name_norm=?",
                (group_id, " ".join(node_name.lower().split())),
            )
            if node is None:
                return {"nodes": [], "edges": []}
            edges = self.db.query(
                "SELECT * FROM kg_edge WHERE group_id=? AND invalid_at IS NULL"
                " AND (source_id=? OR target_id=?) LIMIT ?",
                (group_id, node["id"], node["id"], limit),
            )
        else:
            edges = self.db.query(
                "SELECT * FROM kg_edge WHERE group_id=? AND invalid_at IS NULL"
                " LIMIT ?",
                (group_id, limit),
            )
        node_ids = {e["source_id"] for e in edges} | {
            e["target_id"] for e in edges
        }
        nodes = [
            self.db.query_one("SELECT * FROM kg_node WHERE id=?", (nid,))
            for nid in node_ids
        ]
        # community membership for viz coloring
        comm_of: dict[str, str] = {}
        for c in self.communities(group_id, max_members=1 << 30):
            for name in c["members"]:
                comm_of[name] = c["id"]
        return {
            "nodes": [
                {"id": n["id"], "name": n["name"], "label": n["label"],
                 "community": comm_of.get(n["name"])}
                for n in nodes if n
            ],
            "edges": [
                {"id": e["id"], "source": e["source_id"],
                 "target": e["target_id"], "relation": e["relation"],
                 "fact": e["fact"]}
                for e in edges
            ],
        }

    def stats(self, group_id: str) -> dict:
        nodes = self.db.query_one(
            "SELECT COUNT(*) AS c FROM kg_node WHERE group_id=?", (group_id,)
        )["c"]
        edges = self.db.query_one(
            "SELECT COUNT(*) AS c FROM kg_edge WHERE group_id=? AND"
            " invalid_at IS NULL",
            (group_id,),
        )["c"]
        comms = self.communities(group_id)
        return {"nodes": nodes, "edges": edges,
                "communities": len(comms),
                "community_summaries": [
                    {"id": c["id"], "size": c["size"], "summary": c["summary"]}
                    for c in comms[:10]
                ]}
