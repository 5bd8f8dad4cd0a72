"""wikipedia_wikidata_ray.geo"""
