"""Pure-Python semantic core (no Spark imports).

These modules implement the reference's per-element algebra — sequence
diff/compose (diff.rb), tag diff + significance (tags.rb), geometry
diffs (geom.rb), and the history fold (change_bot.rb) — as plain Python
so they can run inside Arrow-batched grouped pandas UDFs.
"""
