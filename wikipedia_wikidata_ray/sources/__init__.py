"""wikipedia_wikidata_ray.sources"""
