"""DuckDB oracle SQL mirroring the Spark alarm pipeline.

Every CTE here is the line-for-line SQL twin of a Spark operator in
`adapters.py` / `operators/` — same derivation constants, same
null/tombstone handling, same column names. The driver runs these on
the same parquet views at sf0.01 and hash-compares against the Spark
results (see BASELINE.md §b).
"""

from __future__ import annotations

# ---------------------------------------------------------------- CTEs
# Mirrors adapters.py exactly; keep the two in lockstep.
ALARM_CTES = """
snapshot AS (
  SELECT max(epoch_ms(ts)) AS snapshot_ms FROM events
),
actions AS (
  SELECT * FROM (VALUES
    ('class_0', true,  true,  CAST(5 AS BIGINT),    CAST(NULL AS BIGINT), 'P3_MINOR',    'CAMAC',
     'Reset CAMAC crate', 'rationale_0'),
    ('class_1', false, true,  CAST(NULL AS BIGINT), CAST(5 AS BIGINT),    'P2_MAJOR',    'RF',
     'Restart RF chain', 'rationale_1'),
    ('class_2', true,  false, CAST(10 AS BIGINT),   CAST(NULL AS BIGINT), 'P1_CRITICAL', 'BPM',
     'Realign BPM', 'rationale_2')
  ) AS v(name, latchable, filterable, ondelayseconds, offdelayseconds, priority, system,
         correctiveaction, rationale)
),
instances_log AS (
  SELECT event_id AS seq,
         'alarm_' || CAST(user_id AS VARCHAR) AS name,
         CASE WHEN value >= 20
              THEN 'class_' || CAST(user_id % 3 AS VARCHAR) END AS action,
         'pv_' || CAST(user_id AS VARCHAR) AS pv,
         ['hall_' || CAST(user_id % 4 AS VARCHAR),
          'sector_' || CAST(user_id % 8 AS VARCHAR)] AS location
  FROM events WHERE event_type = 'signup'
),
registrations AS (
  SELECT i.name, i.action, i.pv, i.location,
         a.latchable, a.filterable, a.ondelayseconds,
         a.offdelayseconds, a.priority, a.system,
         a.correctiveaction, a.rationale
  FROM (SELECT name, action, pv, location FROM (
          SELECT name, action, pv, location,
                 row_number() OVER (PARTITION BY name ORDER BY seq DESC) AS rn
          FROM instances_log) t
        WHERE rn = 1 AND action IS NOT NULL) i
  LEFT JOIN actions a ON i.action = a.name
),
activations_log AS (
  SELECT event_id AS seq,
         'alarm_' || CAST(user_id AS VARCHAR) AS name,
         CASE event_type WHEN 'error' THEN 'Activation'
                         WHEN 'view'  THEN 'NoActivation' END AS union_type
  FROM events WHERE event_type IN ('error', 'view', 'click')
),
act_flags AS (
  SELECT name, seq, cur_active,
         coalesce(lag(cur_active) OVER (PARTITION BY name ORDER BY seq),
                  false) AS prev_active
  FROM (SELECT name, seq,
               coalesce(union_type = 'Activation', false) AS cur_active
        FROM activations_log) t
),
act_latest AS (
  SELECT name, cur_active AS active,
         (cur_active AND NOT prev_active) AS transition_to_active,
         (NOT cur_active AND prev_active) AS transition_to_normal
  FROM (SELECT *, row_number() OVER (PARTITION BY name ORDER BY seq DESC) AS rn
        FROM act_flags) t
  WHERE rn = 1
),
overrides_log AS (
  SELECT event_id AS seq,
         'alarm_' || CAST(user_id AS VARCHAR) AS name,
         CASE (user_id * 3 + CAST(floor(value) AS BIGINT)) % 21
           WHEN 0 THEN 'Disabled'  WHEN 1 THEN 'Filtered'
           WHEN 2 THEN 'Latched'   WHEN 3 THEN 'Masked'
           WHEN 4 THEN 'OnDelayed' WHEN 5 THEN 'OffDelayed'
           ELSE 'Shelved' END AS type,
         (CAST(floor(value * 10) AS BIGINT) % 10) < 2 AS tombstone,
         (event_id % 2 = 0) AS oneshot,
         epoch_ms(ts) + CAST(floor(value) AS BIGINT) * 43200000 AS expiration,
         CASE WHEN event_id % 3 != 0
              THEN 'note_' || CAST(event_id % 5 AS VARCHAR) END AS comments,
         CASE WHEN event_id % 2 = 0 THEN 'Chattering_Fleeting_Alarm'
              ELSE 'Other' END AS reason
  FROM events
  WHERE event_type = 'purchase'
    AND (user_id * 3 + CAST(floor(value) AS BIGINT)) % 21 < 7
),
ovr_latest AS (
  SELECT name, type, oneshot, expiration, comments, reason
  FROM (SELECT *, row_number() OVER (PARTITION BY name, type
                                     ORDER BY seq DESC) AS rn
        FROM overrides_log) t
  WHERE rn = 1 AND NOT tombstone
),
ovr_live AS (
  SELECT o.name, o.type, o.oneshot, o.expiration, o.comments, o.reason
  FROM ovr_latest o, snapshot s
  WHERE NOT (o.type IN ('Shelved', 'OnDelayed')
             AND o.expiration <= s.snapshot_ms)
),
ovr_set AS (
  SELECT name,
    coalesce(bool_or(type = 'Disabled'), false)   AS ov_disabled,
    coalesce(bool_or(type = 'Filtered'), false)   AS ov_filtered,
    coalesce(bool_or(type = 'Latched'), false)    AS ov_latched,
    coalesce(bool_or(type = 'Masked'), false)     AS ov_masked,
    coalesce(bool_or(type = 'OnDelayed'), false)  AS ov_ondelayed,
    coalesce(bool_or(type = 'OffDelayed'), false) AS ov_offdelayed,
    coalesce(bool_or(type = 'Shelved'), false)    AS ov_shelved,
    max(CASE WHEN type = 'Shelved'   THEN oneshot END)    AS shelved_oneshot,
    max(CASE WHEN type = 'OnDelayed' THEN expiration END) AS ondelayed_expiration,
    max(CASE WHEN type = 'Shelved'   THEN expiration END) AS shelved_expiration
  FROM ovr_live GROUP BY name
),
monolog AS (
  SELECT coalesce(r.name, a.name, o.name) AS name,
         (r.name IS NOT NULL) AS registered,
         r.action, r.priority, r.latchable, r.ondelayseconds,
         coalesce(a.active, false) AS active,
         coalesce(a.transition_to_active, false) AS transition_to_active,
         coalesce(a.transition_to_normal, false) AS transition_to_normal,
         coalesce(o.ov_disabled, false)   AS ov_disabled,
         coalesce(o.ov_filtered, false)   AS ov_filtered,
         coalesce(o.ov_latched, false)    AS ov_latched,
         coalesce(o.ov_masked, false)     AS ov_masked,
         coalesce(o.ov_ondelayed, false)  AS ov_ondelayed,
         coalesce(o.ov_offdelayed, false) AS ov_offdelayed,
         coalesce(o.ov_shelved, false)    AS ov_shelved,
         o.shelved_oneshot
  FROM registrations r
  FULL JOIN act_latest a ON r.name = a.name
  FULL JOIN ovr_set o ON coalesce(r.name, a.name) = o.name
),
flagged AS (
  SELECT *,
    (coalesce(latchable, false) AND transition_to_active
       AND NOT ov_latched) AS latching,
    (coalesce(ondelayseconds > 0, false) AND transition_to_active
       AND NOT ov_ondelayed) AS ondelaying,
    (ov_shelved AND coalesce(shelved_oneshot, false)
       AND transition_to_normal) AS unshelving
  FROM monolog
),
settled AS (
  SELECT *,
    (ov_latched OR latching)      AS eff_latched,
    (ov_ondelayed OR ondelaying)  AS eff_ondelayed,
    (ov_shelved AND NOT unshelving) AS eff_shelved
  FROM flagged
)
""".strip()

STATE_CASE = """
CASE WHEN ov_disabled THEN 'NormalDisabled'
     WHEN ov_filtered THEN 'NormalFiltered'
     WHEN ov_masked   THEN 'NormalMasked'
     WHEN eff_shelved THEN
          (CASE WHEN coalesce(shelved_oneshot, false)
                THEN 'NormalOneShotShelved'
                ELSE 'NormalContinuousShelved' END)
     WHEN eff_ondelayed THEN 'NormalOnDelayed'
     WHEN eff_latched   THEN 'ActiveLatched'
     WHEN ov_offdelayed THEN 'ActiveOffDelayed'
     WHEN active        THEN 'Active'
     ELSE 'Normal' END
""".strip()

EFFECTIVE_ALARMS_SQL = f"""
WITH {ALARM_CTES}
SELECT name, registered, action, priority, active,
       transition_to_active, transition_to_normal,
       ov_disabled, ov_filtered, ov_latched, ov_masked,
       ov_ondelayed, ov_offdelayed, ov_shelved,
       latching, ondelaying, unshelving,
       {STATE_CASE} AS state
FROM settled
"""

# -------------------------------------------------- per-rule queries

EFFECTIVE_REGISTRATIONS_SQL = f"""
WITH {ALARM_CTES}
SELECT name, action, latchable, filterable, ondelayseconds,
       offdelayseconds, priority
FROM registrations
"""

ACTIVATION_TRANSITIONS_SQL = f"""
WITH {ALARM_CTES}
SELECT name, seq, cur_active AS active,
       (cur_active AND NOT prev_active)  AS transition_to_active,
       (NOT cur_active AND prev_active)  AS transition_to_normal
FROM act_flags
"""

OVERRIDE_SET_SQL = f"""
WITH {ALARM_CTES}
SELECT * FROM ovr_set
"""

LATCH_OVERRIDES_SQL = f"""
WITH {ALARM_CTES}
SELECT name, 'Latched' AS type
FROM monolog
WHERE coalesce(latchable, false) AND transition_to_active
"""

ONDELAY_OVERRIDES_SQL = f"""
WITH {ALARM_CTES}
SELECT m.name, 'OnDelayed' AS type,
       s.snapshot_ms + m.ondelayseconds * 1000 AS expiration
FROM monolog m, snapshot s
WHERE coalesce(m.ondelayseconds > 0, false) AND m.transition_to_active
"""

ONESHOT_TOMBSTONES_SQL = f"""
WITH {ALARM_CTES}
SELECT name, 'Shelved' AS type, true AS tombstone
FROM monolog
WHERE ov_shelved AND coalesce(shelved_oneshot, false)
  AND transition_to_normal
"""

# corrected MaskRule (P5+T5): reconcile each child's Masked override
# with its parent's CURRENT activity; parent fixture algebra matches
# rules.q_mask_overrides
MASK_OVERRIDES_SQL = f"""
WITH {ALARM_CTES}
SELECT name, 'Masked' AS type, NOT p_active AS tombstone
FROM (
  SELECT c.name, c.ov_masked,
         coalesce(p.active, false) AS p_active
  FROM (SELECT name, ov_masked,
               CAST(substr(name, 7) AS BIGINT) AS uid
        FROM monolog
        WHERE CAST(substr(name, 7) AS BIGINT) % 7 != 0) c
  LEFT JOIN monolog p
    ON p.name = 'alarm_' || CAST(c.uid - c.uid % 7 AS VARCHAR)
) t
WHERE p_active != ov_masked
"""

SHELVE_EXPIRATIONS_SQL = f"""
WITH {ALARM_CTES}
SELECT o.name, o.type, o.expiration
FROM ovr_latest o, snapshot s
WHERE o.type = 'Shelved' AND o.expiration <= s.snapshot_ms
"""

ONDELAY_EXPIRATIONS_SQL = f"""
WITH {ALARM_CTES}
SELECT o.name, o.type, o.expiration
FROM ovr_latest o, snapshot s
WHERE o.type = 'OnDelayed' AND o.expiration <= s.snapshot_ms
"""

EFFECTIVE_NOTIFICATIONS_SQL = f"""
WITH {ALARM_CTES}
SELECT name, active,
       ov_disabled, ov_filtered, ov_latched, ov_masked,
       ov_ondelayed, ov_offdelayed, ov_shelved,
       {STATE_CASE} AS state
FROM settled
WHERE NOT (latching OR ondelaying OR unshelving)
"""


_OV_HIST_COLS = "\n".join(
    f"""    coalesce(last_value(CASE WHEN tag='O' AND ovr_type='{t}'
               THEN ovr_live END IGNORE NULLS) OVER w, false) AS ov_{t.lower()},"""
    for t in (
        "Disabled", "Filtered", "Latched", "Masked",
        "OnDelayed", "OffDelayed", "Shelved",
    )
)

EFFECTIVE_STATE_HISTORY_SQL = f"""
WITH {ALARM_CTES},
merged AS (
  SELECT seq, name, 'A' AS tag, cur_active,
         CAST(NULL AS VARCHAR) AS ovr_type,
         CAST(NULL AS BOOLEAN) AS ovr_live,
         CAST(NULL AS BOOLEAN) AS ovr_oneshot,
         CAST(NULL AS VARCHAR) AS action_sentinel,
         prev_active
  FROM act_flags
  UNION ALL
  SELECT seq, name, 'O', NULL, type, NOT tombstone,
         CASE WHEN tombstone THEN false ELSE coalesce(oneshot, false) END,
         NULL, NULL
  FROM overrides_log
  UNION ALL
  SELECT seq, name, 'R', NULL, NULL, NULL, NULL,
         coalesce(action, '__deleted__'), NULL
  FROM instances_log
),
asof_state AS (
  SELECT seq, name, tag,
    coalesce(last_value(cur_active IGNORE NULLS) OVER w, false) AS active,
    CASE WHEN tag = 'A' THEN cur_active AND NOT prev_active
         ELSE false END AS t_to_active,
    CASE WHEN tag = 'A' THEN (NOT cur_active) AND prev_active
         ELSE false END AS t_to_normal,
{_OV_HIST_COLS}
    coalesce(last_value(CASE WHEN tag='O' AND ovr_type='Shelved'
               THEN ovr_oneshot END IGNORE NULLS) OVER w, false)
      AS shelved_oneshot,
    nullif(last_value(action_sentinel IGNORE NULLS) OVER w, '__deleted__')
      AS action_eff
  FROM merged
  WINDOW w AS (PARTITION BY name ORDER BY seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
hist AS (
  SELECT a.*, d.latchable, d.ondelayseconds
  FROM asof_state a LEFT JOIN actions d ON a.action_eff = d.name
)
SELECT seq, name, active,
  CASE WHEN ov_disabled THEN 'NormalDisabled'
       WHEN ov_filtered THEN 'NormalFiltered'
       WHEN ov_masked THEN 'NormalMasked'
       WHEN ov_shelved THEN
            (CASE WHEN shelved_oneshot THEN 'NormalOneShotShelved'
                  ELSE 'NormalContinuousShelved' END)
       WHEN ov_ondelayed THEN 'NormalOnDelayed'
       WHEN ov_latched THEN 'ActiveLatched'
       WHEN ov_offdelayed THEN 'ActiveOffDelayed'
       WHEN active THEN 'Active'
       ELSE 'Normal' END AS state
FROM hist
WHERE NOT (
      (coalesce(latchable, false) AND t_to_active AND NOT ov_latched)
   OR (coalesce(ondelayseconds > 0, false) AND t_to_active
       AND NOT ov_ondelayed)
   OR (ov_shelved AND shelved_oneshot AND t_to_normal)
)
"""

REGISTRATION_SCD2_SQL = f"""
WITH {ALARM_CTES},
v AS (
  SELECT name, seq AS valid_from_seq,
         lead(seq) OVER (PARTITION BY name ORDER BY seq) AS valid_to_seq,
         action, pv
  FROM instances_log
)
SELECT name, valid_from_seq, valid_to_seq, action, pv,
       (valid_to_seq IS NULL) AS is_current
FROM v WHERE action IS NOT NULL
"""

# CDC between the seq<=max/2 base snapshot and the current snapshot.
# The base side reuses ALARM_CTES verbatim with its event scans
# textually rebound to the bounded CTE (nested WITH keeps the two
# pipelines' CTE names from colliding).
_BASE_CTES = ALARM_CTES.replace("FROM events", "FROM events_half")

ALARM_SNAPSHOT_CDC_SQL = f"""
WITH events_half AS (
  SELECT * FROM events
  WHERE event_id <= (SELECT max(event_id) // 2 FROM events)
),
base AS (
  SELECT name, {STATE_CASE} AS state FROM (
    WITH {_BASE_CTES}
    SELECT * FROM settled
  ) s
),
cur AS (
  SELECT name, {STATE_CASE} AS state FROM (
    WITH {ALARM_CTES}
    SELECT * FROM settled
  ) s
)
SELECT coalesce(cur.name, base.name) AS name,
       CASE WHEN base.name IS NULL THEN 'added'
            WHEN cur.name  IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type,
       base.state AS state_before,
       cur.state AS state_after
FROM base FULL JOIN cur ON base.name = cur.name
WHERE base.name IS NULL OR cur.name IS NULL OR base.state <> cur.state
"""
